"""Scalar function family queries (string / date / math / json / array /
map / conditional), mirroring SURVEY.md §2.2 "Scalar functions"."""
