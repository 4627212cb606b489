"""Driver-side state: lineage records and resumable partitioned runs."""
