"""spark-submit driver file.

    spark-submit --master local[8] --py-files selfclean_spark.zip \
        tools/submit_main.py --source <path> --checkpoint-root <path>

The package arrives via --py-files; this file only forwards argv to
the CLI (which builds/reuses the session spark-submit created).
"""

from selfclean_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
