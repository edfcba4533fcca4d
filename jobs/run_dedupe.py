"""spark-submit entry point (north rule: ``spark-submit --py-files``):

    zip -r facematch_spark.zip facematch_spark
    spark-submit --master yarn --py-files facematch_spark.zip \
        jobs/run_dedupe.py /path/or/catalog.db.source_files --out s3://bucket/ckpt

Thin wrapper over the CLI so the same code path serves local and cluster runs.
"""

import sys

from facematch_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
