from fairy_core_spark.sources.tables import ParquetDirCatalog, read_input, with_row_id_by_order, with_row_id_ingest

__all__ = ["ParquetDirCatalog", "read_input", "with_row_id_by_order", "with_row_id_ingest"]
