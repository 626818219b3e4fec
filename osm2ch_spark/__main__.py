"""``python -m osm2ch_spark`` — see cli.py."""

import sys

from osm2ch_spark.cli import main

sys.exit(main())
