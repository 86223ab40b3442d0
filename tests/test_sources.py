"""Source-format tests: directory corpus (whole-file text reads with
metadata + glob pruning, fed through a full view cycle), JSON-lines,
and CSV round-trips."""

import json

import pytest
from pyspark.sql import functions as F

from dat_archive_map_reduce_spark.engine import MapReduce
from dat_archive_map_reduce_spark.sources.files import read_directory_corpus
from dat_archive_map_reduce_spark.sources.formats import read_csv, read_jsonl, read_orc, write_orc
from dat_archive_map_reduce_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _write_corpus(root):
    (root / "multi").mkdir(parents=True)
    (root / "single.json").write_text(json.dumps({"first": "a", "second": 1}))
    (root / "multi" / "1.json").write_text(json.dumps({"first": "b", "second": 2}))
    (root / "multi" / "2.json").write_text(json.dumps({"first": "c", "second": 3}))
    (root / "multi" / "notes.txt").write_text("not json")


def map_first(content, meta, emit):
    obj = json.loads(content)
    emit(obj["first"], meta["pathname"])


def test_directory_corpus_metadata_and_glob(spark, tmp_path):
    root = tmp_path / "corpus"
    _write_corpus(root)
    df = read_directory_corpus(spark, str(root), origin="dat://c")
    rows = {r["pathname"]: r for r in df.collect()}
    assert set(rows) == {"/single.json", "/multi/1.json", "/multi/2.json", "/multi/notes.txt"}
    r = rows["/multi/1.json"]
    assert r["url"] == "dat://c/multi/1.json"
    assert json.loads(r["content"])["first"] == "b"
    assert r["version"] == 1 and r["type"] == "put"


def test_directory_corpus_through_view_cycle(spark, tmp_path):
    """Index an on-disk directory end-to-end: corpus read -> changelog
    -> map view -> get/list (the reference's indexFile-by-directory
    walk, lib/indexer.js:375-387)."""
    root = tmp_path / "corpus"
    _write_corpus(root)
    db = MapReduce(spark, str(tmp_path / "wh"))
    db.define("multi", path="/multi/*.json", map=map_first, key_schema=["string"])
    corpus = read_directory_corpus(spark, str(root), origin="dat://c")
    db.changelog.append(corpus)
    db.index("dat://c")
    assert db.get("multi", "b") == {"key": "b", "value": ["/multi/1.json"]}
    got = db.list("multi")
    assert [e["key"] for e in got] == ["b", "c"]  # glob excluded single.json + notes.txt


def test_jsonl_csv_roundtrip_matches_parquet(spark, tmp_path):
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    jdir, cdir = str(tmp_path / "j"), str(tmp_path / "c")
    orders.write.json(jdir)
    orders.write.option("header", "true").csv(cdir)
    schema = "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double"
    j = read_jsonl(spark, jdir, schema=schema)
    c = read_csv(spark, cdir, schema=schema)
    for df in (j, c):
        assert df.exceptAll(orders).count() == 0
        assert orders.exceptAll(df).count() == 0


def test_orc_roundtrip_matches_parquet_with_pushdown(spark, tmp_path):
    """ORC write/read roundtrips exactly, and predicates reach the ORC
    scan (searchArgument pushdown) just like parquet."""
    import io
    from contextlib import redirect_stdout

    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    odir = str(tmp_path / "o")
    write_orc(orders, odir)
    o = read_orc(spark, odir)
    assert o.exceptAll(orders).count() == 0
    assert orders.exceptAll(o).count() == 0
    buf = io.StringIO()
    with redirect_stdout(buf):
        o.filter(F.col("o_orderkey") == 1).explain("formatted")
    assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,1)]" in buf.getvalue()


def test_xml_roundtrip_matches_parquet(spark, tmp_path):
    """XML write -> read via Spark 4's native xml source roundtrips
    the nation table exactly (values and row count), with an explicit
    schema on read so types survive (inference is also exercised and
    must agree on the numeric columns)."""
    from dat_archive_map_reduce_spark.sources.formats import read_xml, write_xml
    from dat_archive_map_reduce_spark.sources.tables import load_table

    nation = load_table(spark, SF, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    xdir = str(tmp_path / "x")
    write_xml(nation, xdir, row_tag="nation", root_tag="nations")
    x = read_xml(
        spark,
        xdir,
        row_tag="nation",
        schema="n_nationkey bigint, n_name string, n_regionkey bigint",
    )
    assert x.exceptAll(nation).count() == 0
    assert nation.exceptAll(x).count() == 0
    inferred = read_xml(spark, xdir, row_tag="nation")
    assert inferred.count() == nation.count()
    assert set(inferred.columns) == set(nation.columns)


def test_fixed_width_roundtrip(spark, tmp_path):
    """Fixed-width write -> read roundtrips the nation table exactly
    (trim + typed casts), and the reader is pure native substring
    projection — no Python stage in the plan."""
    from dat_archive_map_reduce_spark.sources.formats import (
        read_fixed_width,
        write_fixed_width,
    )
    from dat_archive_map_reduce_spark.sources.tables import load_table

    n = load_table(spark, SF, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    out = str(tmp_path / "fw")
    write_fixed_width(n, out, widths=[4, 20, 4])
    back = read_fixed_width(
        spark,
        out,
        [
            ("n_nationkey", 1, 4, "bigint"),
            ("n_name", 5, 20, "string"),
            ("n_regionkey", 25, 4, "bigint"),
        ],
    )
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in n.collect()}
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan


def test_fixed_width_write_rejects_overflow(spark, tmp_path):
    from dat_archive_map_reduce_spark.sources.formats import write_fixed_width
    from dat_archive_map_reduce_spark.sources.tables import load_table

    n = load_table(spark, SF, "nation").select("n_name")
    with pytest.raises(Exception, match="too wide"):
        write_fixed_width(n, str(tmp_path / "fw2"), widths=[3])


def test_jsonl_gzip_transparent(spark, tmp_path):
    """Spark reads .gz-compressed JSONL transparently — the common
    crawl-dump ingestion shape (note: gzip is NOT splittable; one
    file = one task, so shard compressed corpora upstream)."""
    import gzip
    import json as _json

    from dat_archive_map_reduce_spark.sources.formats import read_jsonl

    p = tmp_path / "docs.jsonl.gz"
    with gzip.open(p, "wt") as f:
        for i in range(50):
            f.write(_json.dumps({"id": i, "text": f"doc {i}"}) + "\n")
    got = read_jsonl(spark, str(p), schema="id bigint, text string")
    assert got.count() == 50
    assert got.agg({"id": "sum"}).first()[0] == sum(range(50))


def test_json_multiline_and_csv_gzip_roundtrip(spark, tmp_path):
    """Whole-file JSON (single object AND top-level array framings)
    parses to the same rows as the JSONL path; the CSV sink round-trips
    through gzip with header + custom separator."""
    import json

    from dat_archive_map_reduce_spark.sources.formats import (
        read_json_multiline,
        write_csv,
    )

    rows = [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}, {"id": 3, "name": "c"}]
    src = tmp_path / "docs"
    src.mkdir()
    # one file holding a top-level array, one holding a single object
    (src / "arr.json").write_text(json.dumps(rows[:2], indent=2))
    (src / "one.json").write_text(json.dumps(rows[2], indent=2))
    got = read_json_multiline(spark, str(src), glob="*.json")
    assert sorted((r["id"], r["name"]) for r in got.collect()) == [
        (1, "a"), (2, "b"), (3, "c")
    ]

    out = str(tmp_path / "csv_gz")
    write_csv(got.select("id", "name"), out, compression="gzip", sep="|")
    import glob as g

    assert g.glob(out + "/*.csv.gz"), "gzip codec must produce .csv.gz parts"
    back = (
        spark.read.option("header", "true")
        .option("sep", "|")
        .option("inferSchema", "true")
        .csv(out)
    )
    assert sorted((r["id"], r["name"]) for r in back.collect()) == [
        (1, "a"), (2, "b"), (3, "c")
    ]


def test_avro_binary_encoding_spec_pins():
    """The Avro binary encoding pinned against the SPEC's own
    examples (zigzag varints), the container framing, and the
    codec-family rejection conventions — independent of the
    round-trip (a symmetric encode/decode bug cannot hide here)."""
    import io

    import pytest as _pytest
    from pyspark.sql import types as T

    from dat_archive_map_reduce_spark.sources.avro_io import (
        _MAGIC,
        _read_long,
        _write_long,
        decode_avro,
        encode_avro,
    )

    # spec table: 0->00, -1->01, 1->02, -64->7f, 64->80 01
    for n, want in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"),
                    (-64, b"\x7f"), (64, b"\x80\x01"),
                    (2**40, b"\x80\x80\x80\x80\x80\x40")]:
        b = io.BytesIO()
        _write_long(b, n)
        assert b.getvalue() == want, (n, b.getvalue())
        assert _read_long(io.BytesIO(want)) == n
    sch = T.StructType([
        T.StructField("a", T.LongType(), False),
        T.StructField("s", T.StringType(), True),
    ])
    buf = encode_avro([(1, "hi"), (-1, None)], sch)
    assert buf[:4] == _MAGIC
    # hand-parse: after metadata + sync, block = count(2) size(...)
    # then rows: long 1 -> 02; union idx 1 -> 02; "hi" -> 04 68 69;
    # long -1 -> 01; union idx 0 -> 00
    body = b"\x02\x02\x04hi\x01\x00"
    assert body in buf
    schema_back, rows = decode_avro(buf)
    assert rows == [(1, "hi"), (-1, None)]
    assert [f.name for f in schema_back.fields] == ["a", "s"]
    # deflate codec round-trips and actually shrinks repetitive data
    big = [(i, "x" * 50) for i in range(200)]
    raw = encode_avro(big, sch, codec="null")
    packed = encode_avro(big, sch, codec="deflate")
    assert len(packed) < len(raw) / 2
    assert decode_avro(packed)[1] == big
    # rejections: bad magic, sync mismatch, unsupported type
    with _pytest.raises(ValueError, match="magic"):
        decode_avro(b"XXXX" + buf[4:])
    corrupt = bytearray(buf)
    corrupt[-1] ^= 0xFF  # last sync byte
    with _pytest.raises(ValueError, match="sync"):
        decode_avro(bytes(corrupt))
    with _pytest.raises(ValueError, match="does not support"):
        encode_avro([], T.StructType([
            T.StructField("arr", T.ArrayType(T.LongType()), True)]))


def test_avro_spark_roundtrip_all_types(spark, tmp_path):
    """write_avro -> read_avro through real Spark scans across the
    full supported lattice (nullable ints, doubles, strings, bytes,
    bools, dates, timestamps), multi-partition input -> multi-file
    container layout, plus TPC-H data equality vs parquet."""
    import datetime

    from pyspark.sql import types as T

    from dat_archive_map_reduce_spark.sources.avro_io import (
        read_avro,
        write_avro,
    )

    sch = T.StructType([
        T.StructField("i", T.LongType(), True),
        T.StructField("d", T.DoubleType(), True),
        T.StructField("s", T.StringType(), True),
        T.StructField("b", T.BooleanType(), True),
        T.StructField("bin", T.BinaryType(), True),
        T.StructField("dt", T.DateType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ])
    rows = [
        (1, 1.5, "a", True, b"\x00\xff", datetime.date(2020, 2, 29),
         datetime.datetime(2021, 6, 1, 12, 34, 56, 789123)),
        (None, None, None, None, None, None, None),
        (-7, -0.25, "", False, b"", datetime.date(1969, 12, 31),
         datetime.datetime(1969, 12, 31, 23, 59, 59, 999999)),
    ]
    df = spark.createDataFrame(rows, sch).repartition(2)
    out = str(tmp_path / "avro_all")
    paths = write_avro(df, out)
    assert paths and all(p.endswith(".avro") for p in paths)
    back = read_avro(spark, out)
    assert back.schema == sch
    assert sorted(back.collect(), key=str) == sorted(
        spark.createDataFrame(rows, sch).collect(), key=str)
    # single-FILE path reads exactly that container, never siblings
    if len(paths) > 1:
        one = read_avro(spark, sorted(paths)[0])
        assert 0 < one.count() < back.count()
    # TPC-H shape: region through avro == region from parquet
    region = load_table(spark, SF, "region")
    out2 = str(tmp_path / "avro_region")
    write_avro(region, out2)
    back2 = read_avro(spark, out2)
    assert sorted(map(tuple, back2.collect())) == sorted(
        map(tuple, region.collect()))


def test_avro_mixed_schema_dir_rejects(spark, tmp_path):
    """A directory mixing writer schemas must raise ValueError (the
    portable reader assembles batches positionally under the FIRST
    file's resolved schema — silent misassignment is the failure
    mode this pins against, ADVICE r12)."""
    from pyspark.sql import types as T

    from dat_archive_map_reduce_spark.sources.avro_io import (
        encode_avro,
        read_avro,
    )

    d = tmp_path / "avro_mixed"
    d.mkdir()
    sch_a = T.StructType([
        T.StructField("x", T.LongType(), True),
        T.StructField("y", T.StringType(), True),
    ])
    sch_b = T.StructType([  # same names, swapped order
        T.StructField("y", T.StringType(), True),
        T.StructField("x", T.LongType(), True),
    ])
    (d / "a.avro").write_bytes(encode_avro([(1, "one")], sch_a))
    (d / "b.avro").write_bytes(encode_avro([("two", 2)], sch_b))
    with pytest.raises(Exception, match="does not match"):
        read_avro(spark, str(d)).collect()
