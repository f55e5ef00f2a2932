from calculate_file_content_size_for_vector_db_spark.functions.text import (
    basename,
    preprocess_text,
)

__all__ = ["basename", "preprocess_text"]
