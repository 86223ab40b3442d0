"""Sources: file corpora, changelogs, and the synthetic test tables."""
