"""Report sinks: driver-side Excel workbook + scalable parquet layout."""
