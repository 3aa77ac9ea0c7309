"""Multi-chip scaling: device meshes, batch-sharded generation, multi-host
initialization.

Replaces the reference's distributed stack (`/root/reference/pytorch/
distributed.py`: multi-process NCCL, TCP rendezvous, hand-rolled bucketed
gradient allreduce) with JAX-native sharding:

  * generation is batch-data-parallel: weights REPLICATED, utterance batch
    SHARDED on the 'data' mesh axis, and — the key property carried over from
    the reference (each GPU block-group owns its utterances) — ZERO cross-chip
    communication inside the sample loop.  Each chip runs the fused persistent
    kernel on its own batch shard via shard_map,
  * training collectives (grad all-reduce over ICI/DCN) are inserted by XLA
    under jit from sharding annotations (see train/trainer.py),
  * multi-host bring-up is `jax.distributed.initialize` (one line) instead of
    process spawning + TCP store (`distributed.py:43-53,145-171`).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nv_wavenet_tpu.config import WaveNetConfig
from nv_wavenet_tpu.ops import persistent, scan_generate


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None):
    """Multi-host bring-up (call once per host before device use).  The
    TPU-native replacement for `init_process_group(nccl, tcp://...)`
    (`distributed.py:43-53`); on TPU pods with default env it autodetects."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def data_mesh(n: Optional[int] = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n or len(devices)
    return Mesh(np.asarray(devices[:n]).reshape(n), ("data",))


def stage(mesh: Mesh, spec: P, x_local):
    """Place host data into the sharded layout, multihost-correct.

    Single-process: plain device_put (x_local is the full array).
    Multi-process: x_local is THIS PROCESS's shard along the 'data'-sharded
    dim(s); the global array is assembled with
    `jax.make_array_from_process_local_data` — the JAX-native replacement for
    the reference's per-rank DataLoader + DistributedSampler staging
    (`/root/reference/pytorch/train.py:109-117`)."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x_local, sharding)
    # The local->global shape math below assumes ONLY the 'data' axis spans
    # processes; fail early with a clear message if the mesh puts process
    # boundaries on 'model'/'seq' (the device owning (data=i, other=j) must
    # depend only on i).
    data_ax = mesh.axis_names.index("data")
    procs = np.vectorize(lambda d: d.process_index)(
        np.moveaxis(mesh.devices, data_ax, 0)
        .reshape(mesh.shape["data"], -1))
    assert (procs == procs[:, :1]).all(), (
        "multi-process staging requires process boundaries only on the "
        "'data' mesh axis; this mesh splits a 'model'/'seq' hyper-row "
        "across processes — raise data_parallel (or lower model/seq "
        "parallelism) so each process holds complete non-data rows")
    x_local = np.asarray(x_local)
    gshape = list(x_local.shape)
    for d, name in enumerate(spec):
        # only the 'data' axis spans processes (it is the outermost mesh
        # axis, see trainer.make_mesh); 'model'/'seq' shard WITHIN a
        # process, so those dims arrive process-complete
        names = name if isinstance(name, tuple) else (name,)
        if "data" in names:
            gshape[d] *= jax.process_count()
    return jax.make_array_from_process_local_data(sharding, x_local,
                                                  global_shape=tuple(gshape))


def fetch_local(arr, batch_axis: int) -> np.ndarray:
    """Host copy of the addressable (this-process) portion of a global array
    sharded along `batch_axis` — each process reads back its own utterances,
    mirroring the reference's per-rank output ownership.  Single-process:
    the whole array."""
    if jax.process_count() == 1:
        return np.asarray(arr)
    # deduplicate by batch-axis start: if the array were replicated across a
    # non-data mesh axis, each batch block would appear once per replica and
    # naive concatenation would duplicate utterances (inference meshes are
    # currently data-only, but don't rely on that here)
    shards = {}
    for s in arr.addressable_shards:
        shards.setdefault(s.index[batch_axis].start or 0, s)
    return np.concatenate(
        [np.asarray(shards[k].data) for k in sorted(shards)],
        axis=batch_axis)


def sharded_generate_scan(params: Dict, cfg: WaveNetConfig, mesh: Mesh,
                          cond, selectors, mode: str = "sample"):
    """Batch-sharded generation with the XLA scan generator: weights
    replicated, batch dim sharded on 'data'.  The scan carries only
    per-utterance state, so XLA inserts no collectives in the loop."""
    B = cond.shape[2]
    n_data = mesh.shape["data"]
    assert B % n_data == 0, f"batch {B} not divisible by data axis {n_data}"
    repl = NamedSharding(mesh, P())
    cond_sh = NamedSharding(mesh, P(None, None, "data", None))
    sel_sh = NamedSharding(mesh, P(None, "data"))

    params = jax.device_put(params, repl)
    cond = jax.device_put(jnp.asarray(cond), cond_sh)
    selectors = jax.device_put(jnp.asarray(selectors), sel_sh)
    state = scan_generate.GenState(
        ring=jax.device_put(jnp.zeros((cfg.ring_size, B, cfg.R), jnp.float32),
                            NamedSharding(mesh, P(None, "data", None))),
        y_prev=jax.device_put(
            jnp.full((B,), cfg.silence_bin, jnp.int32),
            NamedSharding(mesh, P("data"))),
        y_cur=jax.device_put(
            jnp.full((B,), cfg.silence_bin, jnp.int32),
            NamedSharding(mesh, P("data"))),
        t=jax.device_put(jnp.zeros((), jnp.int32), repl),
    )
    final_state, y, _ = scan_generate.generate(params, state, cond, selectors,
                                               cfg, mode=mode)
    return final_state, y


def make_sharded_persistent_generator(cfg: WaveNetConfig, mesh: Mesh,
                                      batch_per_device: int, chunk: int,
                                      mode: str = "sample",
                                      weight_dtype=jnp.float32,
                                      compute_dtype=jnp.float32,
                                      interpret: bool = False,
                                      prefold_cond: bool = False,
                                      fast_math: bool = False,
                                      dump: bool = False,
                                      stream_weights: bool = False,
                                      stream_group_size: int = 8,
                                      stream_prefetch: bool = False,
                                      stream_quant: bool = False,
                                      fuse_chain: bool = False,
                                      fuse_pack: bool = False):
    """shard_map the fused Pallas kernel (VMEM-resident or HBM-streaming
    weights) over the 'data' axis: every chip runs the whole network on its
    own utterances (weights replicated in each chip's VMEM).  This is the
    multi-chip scaling mode — utterances/sec scales linearly because the
    sample loop never leaves the chip, mirroring the reference's
    per-block-group batch ownership (`nv_wavenet_singleblock.cuh:264`).

    Returned callable has the engine-facing signature
    `(params, scalars [t0, n_valid, seed] int32[3], cond, sel, ring,
    y_state) -> (y, ring', y_state')` with global (unsharded) shapes; the
    ring is the lane-packed persistent state (`persistent.init_ring`).

    dump=True appends the activation-dump outputs; every dump array is
    per-utterance, so the shards concatenate on the batch axis — the mesh
    version of the reference's dumpActivations getter surface
    (`nv_wavenet.cuh:424-444`)."""
    from jax import shard_map

    if fuse_chain and not stream_weights and not dump:
        # collapsed-chain fast decode (ops/fused_chain.py): same call
        # signature and state format, so the shard_map wrapper is identical.
        # The caller passes the PRE-FOLDED operand tuple (engine
        # _fused_weights: one O(L^2) fold per weight upload), replicated —
        # folding inline here would re-run the fold inside every jitted
        # dispatch, exactly the per-call overhead the latency tier exists
        # to avoid.
        from nv_wavenet_tpu.ops import fused_chain
        gen = fused_chain.make_fused_generator(
            cfg, batch_per_device, chunk, mode=mode,
            weight_dtype=weight_dtype, compute_dtype=compute_dtype,
            interpret=interpret, prefold_cond=prefold_cond,
            fast_math=fast_math, pack_gates=fuse_pack)
        param_spec = tuple(P() for _ in fused_chain.FOLDED_ORDER)
    else:
        gen = persistent.make_persistent_generator(
            cfg, batch_per_device, chunk, mode=mode, weight_dtype=weight_dtype,
            compute_dtype=compute_dtype, interpret=interpret,
            prefold_cond=prefold_cond, fast_math=fast_math, dump=dump,
            stream_weights=stream_weights, stream_group_size=stream_group_size,
            stream_prefetch=stream_prefetch, stream_quant=stream_quant)
        param_spec = jax.tree.map(lambda _: P(), dict.fromkeys(
            persistent.PARAM_ORDER, 0))

    def local_gen(params, scalars, cond, sel, ring, y_state):
        # decorrelate mode="prng" draws across shards: the kernel reseeds
        # additively per absolute sample index (seed + t), so the per-shard
        # stride must exceed any realistic sample count or shard k+1 would
        # replay shard k's stream shifted by the stride.  0x9E3779B9 (golden
        # ratio) keeps streams ~2^31 steps apart.
        seed = (scalars[2]
                + jax.lax.axis_index("data").astype(jnp.int32)
                * jnp.int32(-1640531527))  # 0x9E3779B9 as int32
        out = gen(params, scalars[0:1], cond, sel, ring, y_state,
                  n_valid=scalars[1], seed=seed)
        return tuple(out)

    out_specs = [P(None, "data"), P(None, "data", None), P(None, "data")]
    if dump:
        # xt [L, B, R], skip [L, B, S]: batch is dim 1; zs/za/p [B, A]: dim 0
        out_specs += [P(None, "data", None), P(None, "data", None),
                      P("data"), P("data"), P("data")]
    if mode == "forced":
        out_specs += [P(None, "data", None)]       # p_seq [T, B, A]

    sharded = shard_map(
        local_gen, mesh=mesh,
        in_specs=(param_spec, P(None), P(None, None, "data", None),
                  P(None, "data"), P(None, "data", None), P(None, "data")),
        out_specs=tuple(out_specs),
        check_vma=False)
    return jax.jit(sharded)
