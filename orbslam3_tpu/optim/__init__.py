"""Nonlinear least-squares engine replacing vendored g2o (SURVEY.md §2.2)."""
