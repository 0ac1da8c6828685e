"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference never tests multi-GPU without hardware (SURVEY.md §4); here
multi-device correctness is tested on CPU via XLA's host-platform device
splitting — the TPU-native analog of a fake backend.

NOTE: this environment auto-loads a TPU platform plugin at interpreter
startup and the JAX_PLATFORMS env var is read before user code runs, so
the only reliable way to force the local CPU backend (with fast local
compilation) is jax.config.update after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU aborts the process (F-level check, rendezvous.cc) when the 8
# virtual-device threads don't all reach a collective within 40s — on a
# low-core host running the flagship-config mesh test, the shards execute
# nearly serially and the last thread can be minutes behind. Raise the
# limit so capacity never masquerades as a partitioning bug.
if "xla_cpu_collective_timeout_seconds" not in flags:
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
              " --xla_cpu_collective_timeout_seconds=1800")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite is compile-bound (~25 min cold); warm
# reruns skip identical XLA compilations entirely.
from hoig_tpu.utils.cache import enable as _enable_cache  # noqa: E402

_enable_cache(jax)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
