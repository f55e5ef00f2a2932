from calculate_file_content_size_for_vector_db_spark.sources.io import (
    read_table,
    scan_files,
    write_csv,
)

__all__ = ["read_table", "scan_files", "write_csv"]
