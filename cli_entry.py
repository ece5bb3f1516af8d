"""spark-submit entry point.

``spark-submit`` cannot take ``-m package.module``, so this thin file
is the submittable script referenced by the CLI docs::

    cd /root/repo && zip -qr /tmp/qws.zip quickwit_spark
    spark-submit --py-files /tmp/qws.zip cli_entry.py \
        ingest --index s3://bucket/idx --input cc.web.pages --format iceberg

Everything else lives in :mod:`quickwit_spark.cli`.
"""

import sys

from quickwit_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
