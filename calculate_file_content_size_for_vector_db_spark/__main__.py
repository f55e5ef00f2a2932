from calculate_file_content_size_for_vector_db_spark.cli import main

raise SystemExit(main())
