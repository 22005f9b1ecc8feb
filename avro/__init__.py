"""Stand-in for the `avro` package backed by hail_tpu's own Avro object
container decoder (hail_tpu/io/avro.py). Only the read surface the reference
test-suite uses is provided: DataFileReader iterates records as plain dicts.
"""

from . import datafile, io  # noqa: F401
