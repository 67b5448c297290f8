"""Distributed extraction over a pages corpus (the Ray-native path the
reference has no equivalent of): read → extract stage → write."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import ray

ray.init(address="local", include_dashboard=False)

from go_htmldate_ray.pipelines.extract_dates import extract_dates
from go_htmldate_ray.sources.sink import write_partitioned

ds = extract_dates("/root/testdata/sf0.001")
report = write_partitioned(ds, "/tmp/extract-out", n_shards=8)
print(report)
ray.shutdown()
