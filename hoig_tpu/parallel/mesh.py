"""Device-mesh data parallelism.

Capability parity with the reference's distributed backend
(HOIG_HOv3/train_ddp.py:28-29, models/trainer.py:237-252,
data/__init__.py:13-21): NCCL DistributedDataParallel + DistributedSampler
+ rank-0-only IO.

TPU-native design: a 1-D `jax.sharding.Mesh(('data',))`; parameters and
optimizer state replicated, batches sharded on 'data'. The train step is
jit-compiled with these shardings and XLA inserts the gradient all-reduce
over ICI automatically — there is no hand-written collective (the
reference's `find_unused_parameters=True` graph walk and bucketed NCCL
all-reduce have no analog because XLA sees the whole program). Per-host
input sharding replaces DistributedSampler; `jax.process_index() == 0`
replaces rank-0 gating.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, ("data",))


def num_data_devices(opt=None) -> int:
    """How many local devices the data mesh spans (--num_data_devices, 0=all)."""
    n = int(getattr(opt, "num_data_devices", 0) or 0)
    local = jax.local_device_count()
    if n <= 0:
        return local
    if n > local:
        raise ValueError(f"--num_data_devices {n} > {local} local devices")
    return n


def per_process_batch_size(opt) -> int:
    """Per-process batch for this run.

    The reference's --batch_size is per-GPU: 8 DDP processes x batch 4 =
    global batch 32 (scripts/train_hov3_ddp.sh:31,52). One JAX process
    drives all local chips, so during training the per-process batch is
    batch_size x num_data_devices — the same global batch the reference
    scripts produce, unchanged. Eval keeps batch_size verbatim (reference
    eval runs 1 GPU, eval.py:34).
    """
    b = int(opt.batch_size)
    if getattr(opt, "is_train", False):
        return b * num_data_devices(opt)
    return b


def process_is_primary() -> bool:
    """Rank-0 gating (train_ddp.py:64,100-113 equivalent)."""
    return jax.process_index() == 0


def coordination_barrier(name: str, timeout_ms: int = 1_800_000) -> None:
    """Rendezvous every process WITHOUT a device collective.

    Cross-host communicator contexts (Gloo on CPU) handshake with a short
    deadline on their first collective, so minutes of compile-time skew
    between ranks must be absorbed here — at the coordination service,
    which waits up to timeout_ms — before any collective runs. No-op in
    single-process runs. (The distributed client's barrier is not yet re-
    exported publicly; degrade to a no-op if the internal layout moves.)"""
    try:
        from jax._src import distributed

        client = distributed.global_state.client
    except Exception:
        return
    if client is not None:
        client.wait_at_barrier(name, timeout_ms)


def local_batch_slice(global_batch_size: int) -> slice:
    """Index range this host contributes (DistributedSampler equivalent:
    contiguous per-process shard of the global batch)."""
    per = global_batch_size // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)


class DataParallel:
    """Wraps a train step for SPMD data parallelism.

    Usage:
        dp = DataParallel(train_step)
        state = dp.replicate(state)
        state, metrics = dp.step(state, batch, d_trainable)

    The wrapped step is jit-compiled once with parameters replicated and
    the batch sharded along 'data'; gradients psum over ICI inside the
    compiled program (GSPMD).
    """

    def __init__(self, train_step: Callable, mesh: Mesh | None = None,
                 frozen: Any = None):
        """frozen: optional pytree of constant data (VGG weights, surface
        tables, MANO params) forwarded to the step as a replicated runtime
        argument — keeping it OUT of the lowered module, which otherwise
        embeds ~60 MB of dense constants per program (trainer.py
        make_train_step docstring)."""
        self.mesh = mesh or make_data_mesh()
        self._replicated = NamedSharding(self.mesh, P())
        self._sharded = NamedSharding(self.mesh, P("data"))
        # the mesh spans multiple hosts when it includes devices this
        # process cannot address (jax.devices() on a pod); inputs must then
        # be assembled per-process instead of device_put from one host
        self._multihost = any(
            d.process_index != jax.process_index()
            for d in self.mesh.devices.flat
        )
        if frozen is not None:
            self._frozen = self.replicate(frozen)
            self._step = jax.jit(
                train_step,
                in_shardings=(self._replicated, self._sharded,
                              self._replicated, self._replicated),
                out_shardings=(self._replicated, self._replicated),
                donate_argnums=(0,),
            )
        else:
            self._frozen = None
            self._step = jax.jit(
                train_step,
                in_shardings=(self._replicated, self._sharded, self._replicated),
                out_shardings=(self._replicated, self._replicated),
                donate_argnums=(0,),
            )

    @property
    def num_devices(self) -> int:
        return self.mesh.devices.size

    def replicate(self, tree: Any) -> Any:
        if self._multihost:
            # every process holds identical host values (same seed / same
            # checkpoint); a jit identity with replicated out_shardings
            # turns them into one global replicated array — the supported
            # multi-process path (device_put cannot target non-addressable
            # devices)
            host = jax.tree.map(np.asarray, tree)
            return jax.jit(lambda t: t, out_shardings=self._replicated)(host)
        return jax.device_put(tree, self._replicated)

    def shard_batch(self, batch: Any) -> Any:
        if self._multihost:
            # each process contributes its local shard of the global batch
            # (DistributedSampler semantics: loader.py ShardedSampler)
            return jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(
                    self._sharded, np.asarray(x)
                ),
                batch,
            )
        return jax.device_put(batch, self._sharded)

    def step(self, state, batch, d_trainable):
        """NOTE: `state` is donated (its buffers are consumed); always use
        the returned state. Keep an explicit copy if the input must
        survive (e.g. A/B comparisons in tests)."""
        if self._frozen is not None:
            return self._step(
                state, self.shard_batch(batch), d_trainable, self._frozen
            )
        return self._step(state, self.shard_batch(batch), d_trainable)
