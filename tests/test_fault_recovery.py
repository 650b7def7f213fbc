"""Worker-crash fault injection: a stage that hard-kills its worker process
(os._exit — simulating OOM-killer / node loss, NOT a Python exception) must
be retried by Ray's lineage recovery, and the pipeline result must come
back complete and row-exact (at-least-once execution, exactly-once output).
Poison-doc USER errors are a different path (quarantine, test_pipeline_ray);
this covers infra failure."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def _write_docs(tmp_path, n=500):
    t = pa.Table.from_pydict(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "val": np.arange(n, dtype=np.int64) * 3,
        }
    )
    pq.write_table(t, tmp_path / "in.parquet")
    return int(t["val"].to_pandas().sum())


def test_task_pool_stage_survives_worker_crash(ray_session, tmp_path):
    marker = tmp_path / "crashed_task"
    want = _write_docs(tmp_path)

    def crash_once(t: pa.Table) -> pa.Table:
        if not marker.exists():
            marker.touch()
            os._exit(1)  # hard worker death, not an exception
        return t

    ds = ray.data.read_parquet(str(tmp_path / "in.parquet")).map_batches(
        crash_once, batch_format="pyarrow"
    )
    out = ds.to_pandas()
    assert marker.exists()  # the crash really happened
    assert len(out) == 500
    assert int(out["val"].sum()) == want  # no lost or duplicated rows


def test_actor_pool_stage_survives_actor_crash(ray_session, tmp_path):
    marker = tmp_path / "crashed_actor"
    want = _write_docs(tmp_path)

    class CrashOnceActor:
        def __init__(self, marker_path: str):
            self.marker_path = marker_path

        def __call__(self, t: pa.Table) -> pa.Table:
            if not os.path.exists(self.marker_path):
                open(self.marker_path, "w").close()
                os._exit(1)  # kills the actor process mid-batch
            return t

    ds = ray.data.read_parquet(str(tmp_path / "in.parquet")).map_batches(
        CrashOnceActor,
        fn_constructor_args=(str(marker),),
        batch_format="pyarrow",
        concurrency=2,
    )
    out = ds.to_pandas()
    assert marker.exists()
    assert len(out) == 500
    assert int(out["val"].sum()) == want
