"""pyspark.ml pipelines for the reference's vectorize/cluster stages
(SURVEY.md §2.9 M2§–M5§)."""
