"""spark-submit driver file.

    spark-submit --py-files dist/bifrost_spark.zip \
        --conf spark.sql.shuffle.partitions=2048 \
        tools/submit_entry.py replay --log <events> --table <table>

All arguments after the file name are bifrost_spark.cli arguments.
"""

import sys

from bifrost_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
