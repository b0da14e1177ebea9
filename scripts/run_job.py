"""Thin spark-submit driver file: all logic lives in the packaged module.

    spark-submit --py-files dist/gobblin_spark.zip scripts/run_job.py \
        ingest --events ... --table ... --state ...

Also runnable directly (dev / pure-metadata subcommands like `status`):
falls back to the repo checkout when the zip isn't on sys.path.
"""

import os
import sys

try:
    from gobblin_spark.cli import main
except ModuleNotFoundError:  # direct invocation without --py-files
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from gobblin_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
