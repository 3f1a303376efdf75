"""``python -m s3_kinesis_replay_spark`` — the reference-parity CLI."""

import sys

from s3_kinesis_replay_spark.cli import main

sys.exit(main())
