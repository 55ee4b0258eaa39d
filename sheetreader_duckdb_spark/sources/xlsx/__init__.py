from sheetreader_duckdb_spark.sources.xlsx.datasource import SheetReaderDataSource

__all__ = ["SheetReaderDataSource"]
