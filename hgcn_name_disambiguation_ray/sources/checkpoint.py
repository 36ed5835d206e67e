"""Per-stage Parquet checkpoints with lineage manifests (resumable runs).

The reference memoizes only its API fetches as JSON files
(`openAlex_to_HGCN.py:360-392`); here every expensive stage boundary can
be checkpointed: the stage writes partitioned Parquet plus a
`_manifest.json` recording a caller-supplied lineage fingerprint (input
path + stage version + config hash), row count, and timings. On rerun,
a stage whose manifest matches its fingerprint is *read back* instead of
recomputed — restart-from-checkpoint per the north rule. Writes go to a
temp dir and are renamed into place, so a killed run never leaves a
half-written checkpoint that matches its manifest.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from hashlib import blake2b

from ray.data import Dataset


def fingerprint(*parts: object) -> str:
    h = blake2b(digest_size=16)
    for p in parts:
        h.update(repr(p).encode())
        h.update(b"\x00")
    return h.hexdigest()


def checkpoint_stage(
    ds_factory,
    stage_dir: str,
    lineage: str,
    read_fn=None,
) -> Dataset:
    """Run-or-resume one stage.

    ds_factory: () -> Dataset producing the stage output (lazy until here).
    stage_dir:  directory for this stage's parquet + manifest.
    lineage:    fingerprint string; mismatch invalidates the checkpoint.
    read_fn:    optional custom reader (default ray.data.read_parquet).
    """
    import ray.data as rd

    manifest_path = os.path.join(stage_dir, "_manifest.json")
    data_dir = os.path.join(stage_dir, "data")
    if os.path.exists(manifest_path):
        try:
            with open(manifest_path) as f:
                m = json.load(f)
            if m.get("lineage") == lineage:
                if any(f.endswith(".parquet") for f in os.listdir(data_dir)):
                    return (read_fn or rd.read_parquet)(data_dir)
                return rd.from_items([])
        except (json.JSONDecodeError, OSError):
            pass
        shutil.rmtree(stage_dir, ignore_errors=True)

    os.makedirs(stage_dir, exist_ok=True)
    tmp_dir = os.path.join(stage_dir, "_tmp")
    shutil.rmtree(tmp_dir, ignore_errors=True)
    # pre-create: a zero-row stage writes no files and must still land an
    # (empty) data dir — valid checkpoint, not a crash
    os.makedirs(tmp_dir, exist_ok=True)
    t0 = time.time()
    ds = ds_factory()
    ds.write_parquet(tmp_dir)
    elapsed = time.time() - t0
    if not any(f.endswith(".parquet") for f in os.listdir(tmp_dir)):
        # write_parquet of a zero-row dataset writes NOTHING; persist the
        # stage SCHEMA as one empty parquet file so resume returns an
        # empty dataset with the original columns (a schemaless
        # rd.from_items([]) breaks downstream select_columns/groupby —
        # e.g. an empty mentions checkpoint in run_linkage_sharded)
        schema = ds.schema(fetch_if_missing=True)
        if schema is not None:
            import pyarrow as pa
            import pyarrow.parquet as pq

            arrow_schema = getattr(schema, "base_schema", None) or pa.schema(
                list(zip(schema.names, schema.types))
            )
            pq.write_table(
                arrow_schema.empty_table(), os.path.join(tmp_dir, "empty.parquet")
            )
    shutil.rmtree(data_dir, ignore_errors=True)
    os.rename(tmp_dir, data_dir)
    if any(f.endswith(".parquet") for f in os.listdir(data_dir)):
        out = (read_fn or rd.read_parquet)(data_dir)
    else:
        out = rd.from_items([])
    with open(manifest_path, "w") as f:
        json.dump(
            {
                "lineage": lineage,
                "rows": out.count(),
                "wall_seconds": round(elapsed, 3),
                "written_at_epoch": int(time.time()),
            },
            f,
        )
    return out
