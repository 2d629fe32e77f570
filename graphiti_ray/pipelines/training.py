"""Training-loader surface: the last mile between the cleaned/packed
corpus and N data-parallel trainer workers.

``training_shards`` wraps ``Dataset.streaming_split`` — Ray Data's
multi-consumer iterator: one shared streaming execution feeds N
iterators with backpressure (no materialized copy per worker, blocks
stream from the object store as each consumer pulls). ``equal=True``
guarantees identical row counts per shard so data-parallel steps stay
in lockstep (the trailing remainder is dropped, like every DDP sampler).

``epoch_stream`` composes the deterministic pieces a resumable trainer
needs per epoch: seeded ``random_shuffle`` (reproducible order), then
the split. Re-creating the stream for epoch e with the same seed yields
the same global order — a crashed epoch replays bit-identically.

The torch/tensor conversion (``iter_torch_batches``) is the documented
seam: this environment has no torch, so consumers call
``iter_batches(batch_format="numpy")`` and feed their own framework.
"""

from __future__ import annotations

import ray.data as rd


def training_shards(
    ds: rd.Dataset, n: int, *, equal: bool = True, locality_hints=None
):
    """Split one streaming pipeline into ``n`` per-worker iterators
    (``DataIterator``s). One shared execution, no per-worker copy."""
    return ds.streaming_split(n, equal=equal, locality_hints=locality_hints)


def epoch_stream(
    ds: rd.Dataset,
    n_workers: int,
    epoch: int,
    base_seed: int = 0,
):
    """Seeded per-epoch shuffle + equal split: deterministic, resumable.
    seed = base_seed + epoch so every epoch reshuffles differently but
    reproducibly."""
    shuffled = ds.random_shuffle(seed=base_seed + epoch)
    return training_shards(shuffled, n_workers)
