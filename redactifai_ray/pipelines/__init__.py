"""End-to-end Dataset pipelines: the flagship deidentify chain and reports."""
