"""Operators: the Zed query surface the reference generates/relies on
(SURVEY.md §2.B), re-expressed as DataFrame plan builders, plus the
beyond-reference large-scale pipeline operators (dedup, similarity,
text analysis)."""
