from catgen.eval.quality import quality_report  # noqa: F401
