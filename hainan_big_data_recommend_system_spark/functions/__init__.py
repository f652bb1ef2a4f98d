"""Scalar / array helper functions (SURVEY.md §2.8 F1–F20).

Thin Column-level combinators — codegen'd built-ins, no UDFs, with ONE
deliberate exception: :mod:`.segment` (M1 Chinese segmentation) is a
gated Arrow pandas UDF, because that operator is irreducibly Python; it
crosses the Python worker boundary and must not be treated as a
codegen'd expression when composing plans.
"""
