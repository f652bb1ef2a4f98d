"""Relational + custom operators (SURVEY.md §2).

Each module maps one cluster of the reference's operator inventory onto
DataFrame-native Spark.  Everything here is lazy — functions take and return
DataFrames and compose into a single Catalyst plan.
"""
