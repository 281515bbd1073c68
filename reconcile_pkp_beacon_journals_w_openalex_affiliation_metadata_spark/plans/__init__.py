"""Plan assembly: end-to-end pipelines composed from the operator layer."""
