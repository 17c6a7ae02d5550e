"""Multi-host batch assembly: per-process shard loading + global array placement.

On a real pod each process loads only its shard (cli/train.py:48) and
`put_array`/`shard_batch` assemble the GLOBAL batch via
jax.make_array_from_process_local_data. No second process exists under test, so
we prove the two halves separately on the 8-device CPU mesh:

  1. the loader's shard math: 4 per-shard loaders (shard_id=0..3) reproduce the
     single-host global batch bit-exactly under the documented interleave, and
     hand-placing shard p's rows on data-row p's devices (exactly what
     make_array_from_process_local_data does per process) yields that global
     array;
  2. the multiprocess code path: force spans_processes()=True and check
     put_array routes through make_array_from_process_local_data and matches
     the device_put result (single-process: local shard == global batch).

Reference semantics being reproduced: MultiDistBaseDataLoaderExplicitSplit /
DistributedSampler(num_replicas, rank, drop_last=True)
(base_data_loader.py:110-130).
"""

import jax
import numpy as np
import pytest

from oatx.parallel import mesh as meshlib


class IdentDataset:
    """Sample i is a tiny video filled with the value i — sample identity is
    readable straight off the batch tensor."""

    dataset_name = "Ident"

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def get_sample(self, i, rng):
        return {
            "video": np.full((2, 4, 4, 3), i, np.uint8),
            "text": f"sample {i}",
            "meta": {"index": i},
        }


@pytest.fixture(scope="module")
def tokenizer():
    from oatx.data.tokenizer import WordPieceTokenizer

    return WordPieceTokenizer.build_from_corpus(
        [f"sample {i}" for i in range(64)], vocab_size=256)


def _loader(tokenizer, shard_id, num_shards, batch_size):
    from oatx.data.loader import Collator, ShardedLoader

    return ShardedLoader(
        IdentDataset(64), batch_size=batch_size, collate=Collator(tokenizer),
        shuffle=True, shard_id=shard_id, num_shards=num_shards,
        num_workers=2, seed=11)


def _ids(batch):
    return batch["video"][:, 0, 0, 0, 0].astype(np.int64)


def test_per_shard_loading_reassembles_single_host_batch(tokenizer):
    """Shard-major concat of the 4 per-process batches == the single-host global
    batch under the DistributedSampler interleave (global[j*S + p] = shard p,
    row j)."""
    S, b = 4, 4  # data-parallel shards × per-shard batch
    single = list(_loader(tokenizer, 0, 1, S * b))
    shards = [list(_loader(tokenizer, p, S, b)) for p in range(S)]
    assert all(len(sh) == len(single) for sh in shards)

    for t in range(len(single)):
        assembled = np.concatenate([_ids(shards[p][t]) for p in range(S)])
        # documented interleave: assembled[p*b + j] == single[j*S + p]
        expect = _ids(single[t]).reshape(b, S).T.reshape(-1)
        np.testing.assert_array_equal(assembled, expect)


def test_row_local_placement_reproduces_global_array(tokenizer):
    """Placing shard p's rows on data-row p's devices (the per-process
    contribution contract of make_array_from_process_local_data) assembles the
    expected global sharded array."""
    S, b = 4, 4
    mesh = meshlib.make_mesh(8, model_parallel=2)
    assert mesh.shape[meshlib.DATA_AXIS] == S
    sharding = meshlib.batch_sharding(mesh)

    shard_videos = [next(iter(_loader(tokenizer, p, S, b)))["video"]
                    for p in range(S)]
    global_shape = (S * b,) + shard_videos[0].shape[1:]
    bufs = [jax.device_put(shard_videos[p], mesh.devices[p, m])
            for p in range(S) for m in range(mesh.shape[meshlib.MODEL_AXIS])]
    arr = jax.make_array_from_single_device_arrays(global_shape, sharding, bufs)
    np.testing.assert_array_equal(np.asarray(arr),
                                  np.concatenate(shard_videos))


def test_put_array_multiprocess_path(monkeypatch):
    """Force the spans_processes branch: put_array must route through
    make_array_from_process_local_data, produce the same values/sharding as
    device_put (single process ⇒ local == global), and actually call it."""
    mesh = meshlib.make_mesh(8, model_parallel=2)
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)

    expect = np.asarray(jax.device_put(x, meshlib.batch_sharding(mesh)))

    calls = []
    real = jax.make_array_from_process_local_data

    def spy(sharding, local, *a, **k):
        calls.append(local.shape)
        return real(sharding, local, *a, **k)

    monkeypatch.setattr(meshlib, "spans_processes", lambda m: True)
    monkeypatch.setattr(jax, "make_array_from_process_local_data", spy)
    out = meshlib.put_array(mesh, x)
    assert calls == [(8, 3)]
    np.testing.assert_array_equal(np.asarray(out), expect)
    assert out.sharding.spec == meshlib.batch_sharding(mesh).spec


def test_shard_batch_multiprocess_matches_singlehost(monkeypatch):
    """shard_batch over the forced-multiprocess path == the plain path for a
    whole pytree batch."""
    mesh = meshlib.make_mesh(8, model_parallel=2)
    batch = {
        "video": np.random.default_rng(0).standard_normal((8, 2, 4, 4, 3)
                                                          ).astype(np.float32),
        "input_ids": np.arange(8 * 5).reshape(8, 5),
    }
    plain = meshlib.shard_batch(mesh, batch)
    monkeypatch.setattr(meshlib, "spans_processes", lambda m: True)
    multi = meshlib.shard_batch(mesh, batch)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(multi[k]), np.asarray(plain[k]))
        assert multi[k].sharding.spec == plain[k].sharding.spec
