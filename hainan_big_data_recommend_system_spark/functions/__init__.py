"""Scalar / array helper functions (SURVEY.md §2.8 F1–F20).

Thin Column-level combinators — all codegen'd built-ins, no UDFs.
"""
