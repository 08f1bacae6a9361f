"""Worker-crash fault tolerance: a mid-pipeline task that dies is
retried by Ray and the job completes with byte-identical output.

At 100 TB on a 256-node cluster, worker loss is routine; the engine's
claim is that every stage is a stateless (or actor-pool) task whose
retry is safe. This test kills one worker process mid-curation (real
``os._exit``, not an exception) and asserts the pipeline's final
output matches an undisturbed run.
"""

import os
import tempfile

import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data

from neuscraper_ray.pipelines.curate import CurateConfig, curate
from neuscraper_ray.synth import write_pages


def _run_curate(paths, crash_flag: str | None):
    ds = ray.data.read_parquet(paths, columns=["url", "html"])
    if crash_flag is not None:

        def maybe_crash(t: pa.Table) -> pa.Table:
            # first task to claim the flag kills its whole worker
            # process — a real crash, after which Ray must reschedule
            try:
                fd = os.open(crash_flag, os.O_CREAT | os.O_EXCL)
                os.close(fd)
                os._exit(1)
            except FileExistsError:
                pass
            return t

        ds = ds.map_batches(maybe_crash, batch_format="pyarrow", batch_size=32)
    out = curate(ds, CurateConfig(num_buckets=8)).to_pandas()
    return out.sort_values("url").reset_index(drop=True)


def test_worker_crash_mid_pipeline_retries_and_matches():
    with tempfile.TemporaryDirectory() as td:
        paths = write_pages(os.path.join(td, "pages"), 300, rows_per_file=50)
        clean = _run_curate(paths, None)
        flag = os.path.join(td, "crashed_once")
        crashed = _run_curate(paths, flag)
        assert os.path.exists(flag), "crash task never ran"
        pd.testing.assert_frame_equal(clean, crashed)
