"""WaveNetInfer — the inference engine with API parity to the reference's
`nvWavenetInfer` class (`/root/reference/nv_wavenet.cuh:220-640`).

Same surface: constructor with model geometry + implementation choice,
weight-upload setters, `set_inputs`, `run` / `run_partial` / `run_chunks`
(chunked generation with a host consume callback), and activation getters
backed by a dump mode.  Differences are deliberate TPU-first design:

  * the engine is CACHED and jitted once per (config, batch, chunk, mode)
    instead of rebuilt per call (the reference rebuilds the whole engine on
    every `wavenet_infer()` call, `pytorch/wavenet_infer.cu:105-145`),
  * R/S/A are runtime config, not compile-time templates,
  * `Impl.PERSISTENT` maps to the fused Pallas VMEM-resident kernel;
    `Impl.MANYBLOCK` maps to the same kernel with stream_weights=True (the
    per-layer weight stacks stay in HBM, double-buffered per-layer DMA — for
    configs whose weights+state exceed VMEM; mode="prng" falls back to the
    XLA scan generator whose threefry draws run on any backend);
    SINGLE_BLOCK/DUAL_BLOCK are accepted for parity and map to PERSISTENT
    (the reference needed them only because of GPU register-file limits —
    SURVEY §7 "what deliberately does not carry over"),
  * AUTO picks PERSISTENT when the VMEM plan fits, else MANYBLOCK — the
    planning analog of the reference's AUTO heuristic + occupancy assert
    (`nv_wavenet.cuh:502-509`, `nv_wavenet_util.cuh:42-58`).
"""

from __future__ import annotations

import enum
import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from nv_wavenet_tpu.config import WaveNetConfig
from nv_wavenet_tpu.models import params as params_lib
from nv_wavenet_tpu.ops import fused_chain, persistent, scan_generate


class Impl(enum.Enum):
    """Implementation selector (API parity: `nv_wavenet.cuh:223-229`)."""
    AUTO = 0
    SINGLE_BLOCK = 1
    DUAL_BLOCK = 2
    PERSISTENT = 3
    MANYBLOCK = 4


# Conservative per-core VMEM budget for the persistent plan.  Replaces the
# reference's occupancy assert: if the plan exceeds this, AUTO falls back to
# the HBM-streaming scan path instead of failing to launch.
DEFAULT_VMEM_BUDGET = 100 * 1024 * 1024


def _selector_stream(seed: int, t0, T: int, B: int,
                     pidx: int = 0) -> np.ndarray:
    """Default streaming-feed selectors [T, B]: a vectorized counter-based
    uniform stream (splitmix64 finalizer) keyed on (seed, ABSOLUTE sample
    index, batch row, process).  Chunk-invariant by construction — sample t
    draws the same value however the caller chunks the conditioning — and
    O(T*B) numpy vector ops instead of one RandomState PER SAMPLE on the
    latency-critical serving path (ADVICE r3 / VERDICT r3 #5).

    `t0` may be a scalar (lockstep) or a PER-ROW [B] vector (ragged feeds,
    desynced row clocks): row b's column is keyed on t0[b] + step — the
    same uint64 counter math, so a row's stream depends only on its own
    absolute clock, never on its batchmates."""
    t0a = np.asarray(t0, np.uint64)
    t = np.arange(T, dtype=np.uint64)[:, None] + t0a[None, :] \
        if t0a.ndim == 1 else np.arange(t0a, t0a + np.uint64(T),
                                        dtype=np.uint64)[:, None]
    b = np.arange(B, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        x = (np.uint64(seed & 0xFFFFFFFFFFFFFFFF)
             + t * np.uint64(0x9E3779B97F4A7C15)
             + b * np.uint64(0xC2B2AE3D27D4EB4F)
             + np.uint64(pidx) * np.uint64(0x165667B19E3779F9))
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    # top 24 bits -> uniform [0, 1) float32
    return ((x >> np.uint64(40)).astype(np.float32)
            * np.float32(2.0 ** -24))


class WaveNetInfer:
    def __init__(self,
                 num_layers: int,
                 max_dilation: int,
                 R: int = 64,
                 S: int = 256,
                 A: int = 256,
                 max_batch: int = 1,
                 implementation: Impl = Impl.AUTO,
                 tanh_embed: bool = True,
                 chunk_size: int = 64,
                 weight_dtype=jnp.float32,
                 compute_dtype=jnp.float32,
                 vmem_budget: int = DEFAULT_VMEM_BUDGET,
                 interpret: bool = False,
                 fast_math: bool = False,
                 stream_group_size: int = 8,
                 stream_prefetch: bool = False,
                 stream_quant: Optional[str] = None,
                 fuse_chain: bool = False,
                 fuse_pack: bool = False,
                 temperature: float = 1.0,
                 priority: Optional[str] = None,
                 mesh=None):
        # decode-priority tier (serving knob): priority="latency" selects
        # the hardware-proven fastest decode — the collapsed-chain kernel
        # with single-pass MXU matmuls (fused + fast_math: 154.8 vs 92.5
        # kHz/utt exact on the flagship, BASELINE.md fast-tier table) —
        # without the caller micromanaging kernel knobs.  Governed by the
        # same TV contract bound as fast_math alone.  Dump dispatches and
        # VMEM overflows fall back to the EXACT kernel: both priority-set
        # knobs (fuse_chain via _fuse_active AND fast_math via
        # _effective_fast_math) are dropped there, so the activation-getter
        # debug surface stays bit-exact.  An EXPLICIT fast_math=True is the
        # caller's own choice and stays in effect on dump runs.
        # priority="exact" / None leaves every knob as passed (the
        # exact-match contract path).
        if priority not in (None, "exact", "latency"):
            raise ValueError(f"unknown priority {priority!r}: "
                             f"expected None, 'exact' or 'latency'")
        self.priority = priority
        self._fast_math_from_priority = False
        if priority == "latency":
            fuse_chain = True
            if not fast_math:
                fast_math = True
                self._fast_math_from_priority = True
        self.cfg = WaveNetConfig(num_layers=num_layers, R=R, S=S, A=A,
                                 max_dilation=max_dilation,
                                 tanh_embed=tanh_embed)
        self.max_batch = max_batch
        self.implementation = implementation
        self.chunk_size = chunk_size
        self.weight_dtype = weight_dtype
        self.compute_dtype = compute_dtype
        self.vmem_budget = vmem_budget
        self.interpret = interpret
        self.fast_math = fast_math  # fp32 storage, single-pass MXU (not exact)
        # MANYBLOCK weight-streaming schedule knobs (exactness-neutral):
        # layers per DMA group, and next-step group-0 prefetch under the
        # output stack
        self.stream_group_size = stream_group_size
        self.stream_prefetch = stream_prefetch
        # int8 storage of the MANYBLOCK path's streamed weight stacks
        # (per-channel scales, exactly-rounded in-kernel dequantize): halves
        # its per-step HBM weight traffic again vs bf16, deterministic
        # (kernel bit-matches the dequantized-weights oracle,
        # tests/test_streaming_kernel.py)
        assert stream_quant in (None, "int8"), stream_quant
        self.stream_quant = stream_quant
        if stream_quant:
            assert weight_dtype == jnp.float32, (
                "stream_quant replaces the streamed stacks' storage; "
                "combine with fp32 weight_dtype only")
        # collapsed-chain fast decode (ops/fused_chain.py): shortens the
        # dependent per-sample matmul chain from 2L+3 to ~L+5 by folding the
        # residual stream into precomputed weights.  NOT bit-exact (fp32
        # sums reassociate) — governed by the teacher-forced distribution
        # contract like bf16/fast_math.  Activation-dump runs route off the
        # fused kernel onto the persistent-shape kernel (the getters are a
        # debug surface); any OTHER caller-set accuracy knob (explicit
        # fast_math, bf16) stays in effect there.
        self.fuse_chain = fuse_chain
        # tight R-lane gate packing inside the fused kernel (for R<128:
        # halves the dependent chain matmuls' K extent and the G stack's
        # VMEM; see ops/fused_chain._row_stride)
        self.fuse_pack = fuse_pack
        # sampling temperature (serving knob, no reference analog):
        # softmax(za / T) implemented as a WEIGHT transform — end_w and
        # end_b scale by 1/T at device upload — so every implementation
        # (kernel, fused, scan, golden) applies it identically with zero
        # kernel changes and no per-step cost.  T=1 is a true no-op (the
        # exact-match contract is untouched).  Note get_za() then returns
        # the tempered logits (they ARE what was sampled from).
        assert temperature > 0, temperature
        self.temperature = float(temperature)
        self.sampling_seed = 0  # used by mode="prng" (in-kernel TPU PRNG)
        # multi-chip batch sharding: a jax Mesh with a 'data' axis.  Weights
        # replicate, the utterance batch shards, and the sample loop stays
        # on-chip (shard_map of the fused kernel) — P1/§2.6 scaling mode
        self.mesh = mesh
        if mesh is not None:
            n = mesh.shape["data"]
            assert max_batch % n == 0, (
                f"max_batch {max_batch} not divisible by data axis {n}")

        cfg = self.cfg
        L = cfg.num_layers
        # canonical params assembled incrementally by the setters
        self._np_params: Dict[str, np.ndarray] = {
            "embed": np.zeros((2 * A, R), np.float32),
            "dil_w": np.zeros((L, 2 * R, 2 * R), np.float32),
            "dil_b": np.zeros((L, 2 * R), np.float32),
            "rs_w": np.zeros((L, R, R + S), np.float32),
            "rs_b": np.zeros((L, R + S), np.float32),
            "out_w": np.zeros((S, A), np.float32),
            "out_b": np.zeros((A,), np.float32),
            "end_w": np.zeros((A, A), np.float32),
            "end_b": np.zeros((A,), np.float32),
        }
        self._params: Optional[Dict[str, jax.Array]] = None  # device copy
        self._params_cast: Optional[Dict[str, jax.Array]] = None
        self._cond: Optional[np.ndarray] = None
        self._cond_pre = None
        self._selectors: Optional[np.ndarray] = None
        self._ring = None
        self._y_state = None
        self._dumps = None
        self._fused_prep = None
        self._spec_prep = None
        self._warned_fuse_vmem = False
        self._gen_cache: Dict = {}
        self._feed_cache: Dict = {}
        # per-(T,B,stream,forced) feed plan (fused?, chunk): the VMEM-plan
        # walk costs ~50 us per call, on the per-feed serving hot path; its
        # inputs (cfg, weight dtype, vmem budget, fuse flags, chunk_size)
        # are all constructor-fixed, so the plan is engine-immutable
        self._feed_plan: Dict = {}
        self._stream_t: Optional[int] = None  # begin_stream/feed cursor
        self._stream_t_row = None             # per-row clocks (ragged feeds)
        # adaptive speculative decode (ops/speculative.DEFAULT_COST):
        # (V0_us, V1_us, E0_us) — spec round cost ~ V0+V1*K vs exact
        # per-step E0.  Steers only WHICH equally-exact branch runs;
        # override after measuring your config (tools/spec_checkpoint_probe)
        from nv_wavenet_tpu.ops import speculative as _spec
        self.spec_cost_model = _spec.DEFAULT_COST
        self.spec_rounds: Optional[int] = None
        self._spec_branch_dev = None   # device scalar; spec_branch fetches

    # ------------------------------------------------------------------
    # weight upload (reference setter parity, `nv_wavenet.cuh:396-415`)
    # ------------------------------------------------------------------

    def _invalidate(self):
        self._params = None
        self._params_cast = None
        self._cond_pre = None
        self._fused_prep = None
        self._spec_prep = None

    def _fused_weights(self):
        """Folded fused-chain operand tuple, computed ONCE per weight upload
        (the O(L^2) residual-stream fold must not re-run on every chunked /
        streaming dispatch of the latency-oriented fast decode)."""
        if self._fused_prep is None:
            self._fused_prep = jax.jit(
                lambda p: fused_chain.prepare_weights(
                    p, self.cfg, True, self.weight_dtype, self.fuse_pack)
            )(self._device_params())
        return self._fused_prep

    def set_embeddings(self, embed_prev, embed_cur):
        """embed_prev/embed_cur: [R, A] (column per symbol)."""
        self._np_params["embed"] = np.concatenate(
            [np.asarray(embed_prev, np.float32).T,
             np.asarray(embed_cur, np.float32).T], axis=0)
        self._invalidate()

    def set_layer_weights(self, layer, Wprev, Wcur, Bh, Wres, Bres, Wskip, Bskip):
        """Reference math shapes: Wprev/Wcur [2R, R], Bh [2R], Wres [R, R],
        Bres [R], Wskip [S, R], Bskip [S]."""
        R = self.cfg.R
        p = self._np_params
        p["dil_w"][layer] = np.concatenate(
            [np.asarray(Wprev, np.float32).T, np.asarray(Wcur, np.float32).T],
            axis=0)
        p["dil_b"][layer] = np.asarray(Bh, np.float32)
        p["rs_w"][layer, :, :R] = np.asarray(Wres, np.float32).T
        p["rs_w"][layer, :, R:] = np.asarray(Wskip, np.float32).T
        p["rs_b"][layer, :R] = np.asarray(Bres, np.float32)
        p["rs_b"][layer, R:] = np.asarray(Bskip, np.float32)
        self._invalidate()

    def set_out_weights(self, Wzs, Bzs, Wza, Bza):
        """Wzs [A, S], Wza [A, A]."""
        p = self._np_params
        p["out_w"] = np.asarray(Wzs, np.float32).T.copy()
        p["out_b"] = np.asarray(Bzs, np.float32).copy()
        p["end_w"] = np.asarray(Wza, np.float32).T.copy()
        p["end_b"] = np.asarray(Bza, np.float32).copy()
        self._invalidate()

    def set_reference_weights(self, ref: Dict):
        """Upload a whole reference-shaped weight dict at once."""
        self.set_embeddings(ref["embed_prev"], ref["embed_cur"])
        for l in range(self.cfg.num_layers):
            self.set_layer_weights(l, ref["Wprev"][l], ref["Wcur"][l],
                                   ref["Bh"][l], ref["Wres"][l], ref["Bres"][l],
                                   ref["Wskip"][l], ref["Bskip"][l])
        self.set_out_weights(ref["Wzs"], ref["Bzs"], ref["Wza"], ref["Bza"])

    def set_canonical_params(self, params: Dict):
        """Upload params already in canonical layout (e.g. from the trainer's
        export path)."""
        params_lib.validate_canonical(params, self.cfg)
        self._np_params = {k: np.asarray(v, np.float32) for k, v in params.items()}
        self._invalidate()

    # ------------------------------------------------------------------
    # inputs (`nv_wavenet.cuh:417`)
    # ------------------------------------------------------------------

    def set_inputs(self, cond: np.ndarray, selectors: Optional[np.ndarray] = None,
                   seed: Optional[int] = None):
        """cond: [T, L, B, 2R] conditioning; selectors: [T, B] uniforms in
        [0,1).  If selectors is None they are drawn from the engine's ONE
        default selector stream — the splitmix64 counter keyed on (seed,
        absolute sample index, batch row, process) that `feed` also uses
        (`_selector_stream`) — the analog of the reference's host-side
        rand() selectors (`pytorch/wavenet_infer.cu:92-93`), but
        reproducible AND input-mode-invariant: a default-stream `run()`
        bit-matches the same utterance generated through `begin_stream`/
        `feed` chunks (tests/test_engine.py), so served streams replay
        through run() without manual selector injection.  `seed` defaults
        to the engine's `sampling_seed` (also the mode="prng" seed).

        Under a MULTI-HOST mesh, cond/selectors are this process's batch
        shard (B_local = B_global / process_count); subsequent batch_size
        arguments are global; processes draw decorrelated selector streams
        (the stream is keyed on process index)."""
        T, L, Bl, C = cond.shape
        assert L == self.cfg.num_layers and C == 2 * self.cfg.R, (
            f"cond shape {cond.shape} does not match config "
            f"(L={self.cfg.num_layers}, 2R={2 * self.cfg.R})")
        B = Bl * self._n_proc()               # global utterance batch
        assert B <= self.max_batch
        self._check_mesh_batch(B)
        if selectors is None:
            pidx = jax.process_index() if self.mesh is not None else 0
            selectors = _selector_stream(
                self.sampling_seed if seed is None else seed, 0, T, Bl, pidx)
        assert selectors.shape == (T, Bl)
        # stage inputs on device ONCE (the analog of the reference's
        # device-pointer input path, `nv_wavenet_conversions.cuh:38-42` /
        # `nv_wavenet_test.cu:359-365`); per-run slices then stay on device.
        # With a mesh, the utterance batch dim shards across chips.
        self._cond = self._shard(jnp.asarray(cond, jnp.float32),
                                 P(None, None, "data", None))
        self._cond_pre = None   # dil_b-prefolded copy, built lazily per weights
        self._selectors = self._shard(jnp.asarray(selectors, jnp.float32),
                                      P(None, "data"))
        self._reset_state(B)

    def _n_proc(self) -> int:
        """Processes participating in the mesh (multi-host pods >1).  Under
        multihost the engine follows the reference's per-rank data ownership
        (`pytorch/train.py:109-117`): callers pass PER-PROCESS batch shards
        of cond/selectors and read back their own utterances; batch_size
        arguments stay GLOBAL."""
        return jax.process_count() if self.mesh is not None else 1

    def _shard(self, x, spec):
        if self.mesh is None:
            return x
        from nv_wavenet_tpu.parallel import mesh as mesh_lib
        return mesh_lib.stage(self.mesh, spec, x)

    def _check_mesh_batch(self, batch: int):
        """Fail early with a clear message instead of deep inside
        shard_map/device_put when the batch can't shard evenly."""
        if self.mesh is not None:
            n = self.mesh.shape["data"]
            assert batch % n == 0, (
                f"batch_size {batch} not divisible by the mesh 'data' axis "
                f"({n} chips); pad the utterance batch to a multiple of {n}")

    def _reset_state(self, batch):
        """batch is GLOBAL; state arrays are created at per-process size and
        staged into the (possibly multi-host) sharded layout."""
        cfg = self.cfg
        b_loc = batch // self._n_proc()
        ring_dtype = (jnp.float32 if self.compute_dtype == jnp.float32
                      else self.compute_dtype)
        self._ring = self._shard(persistent.init_ring(cfg, b_loc, ring_dtype),
                                 P(None, "data", None))
        self._y_state = self._shard(
            jnp.full((2, b_loc), cfg.silence_bin, jnp.int32), P(None, "data"))
        st = scan_generate.init_state(cfg, b_loc, ring_dtype)
        if self.mesh is not None:
            st = scan_generate.GenState(
                ring=self._shard(st.ring, P(None, "data", None)),
                y_prev=self._shard(st.y_prev, P("data")),
                y_cur=self._shard(st.y_cur, P("data")),
                t=self._shard(st.t, P()))
        self._scan_state = st

    def export_state(self) -> Dict[str, np.ndarray]:
        """Snapshot the carried generation state as host numpy: the packed
        dilation-FIFO ring, the last two emitted symbols, the scan-path
        state, and the stream cursor.  With `import_state` this enables
        server-side session migration and fault recovery MID-STREAM — a
        serving capability beyond the reference, whose generation state
        lives opaquely in device memory between `run_partial` calls
        (`nv_wavenet.cuh:499`).  Under multihost each process exports its
        own utterances' shard (per-rank ownership, like set_inputs)."""
        assert self._ring is not None, "no generation state yet"
        if self._n_proc() > 1:
            from nv_wavenet_tpu.parallel import mesh as mesh_lib
            fetch = mesh_lib.fetch_local
        else:
            def fetch(arr, axis):
                return np.asarray(arr)
        st = self._scan_state
        return {
            "ring": fetch(self._ring, 1),
            "y_state": fetch(self._y_state, 1),
            "scan_ring": fetch(st.ring, 1),
            "scan_y_prev": fetch(st.y_prev, 0),
            "scan_y_cur": fetch(st.y_cur, 0),
            "scan_t": np.asarray(jax.device_get(st.t)),
            "stream_t": np.asarray(-1 if self._stream_t is None
                                   else self._stream_t),
            "stream_batch": np.asarray(getattr(self, "_stream_batch", 0)),
        }

    def import_state(self, state: Dict[str, np.ndarray]):
        """Restore a generation snapshot taken by `export_state` (possibly
        in another process / after a restart): subsequent `feed` /
        `run_partial` calls continue the stream exactly where the exporting
        engine left off.  Weights and config must match the exporter's;
        state arrays are per-process shards under multihost."""
        from nv_wavenet_tpu.ops import scan_generate as sg
        ring_dtype = (jnp.float32 if self.compute_dtype == jnp.float32
                      else self.compute_dtype)
        self._ring = self._shard(jnp.asarray(state["ring"], ring_dtype),
                                 P(None, "data", None))
        self._y_state = self._shard(jnp.asarray(state["y_state"], jnp.int32),
                                    P(None, "data"))
        st = sg.GenState(ring=jnp.asarray(state["scan_ring"], ring_dtype),
                         y_prev=jnp.asarray(state["scan_y_prev"], jnp.int32),
                         y_cur=jnp.asarray(state["scan_y_cur"], jnp.int32),
                         t=jnp.asarray(state["scan_t"], jnp.int32))
        if self.mesh is not None:
            st = sg.GenState(
                ring=self._shard(st.ring, P(None, "data", None)),
                y_prev=self._shard(st.y_prev, P("data")),
                y_cur=self._shard(st.y_cur, P("data")),
                t=self._shard(st.t, P()))
        self._scan_state = st
        stream_t = int(state["stream_t"])
        self._stream_t = None if stream_t < 0 else stream_t
        if int(state["stream_batch"]):
            self._stream_batch = int(state["stream_batch"])

    def reset_utterances(self, rows):
        """Reset the generation state of SELECTED batch rows to silence while
        the rest of the batch keeps generating — continuous batching for
        serving: a finished utterance's slot is handed to a new one without
        stopping the other streams (no reference analog; the reference resets
        the whole engine per `setInputs`, `nv_wavenet.cuh:417`).

        `rows` are GLOBAL batch indices (the state arrays are global; under
        a mesh the scatter preserves their sharding).  Under MULTIHOST every
        process must make the same call with the same rows — the update is
        part of the SPMD program, unlike the per-rank data staging of
        set_inputs.  A reset row behaves exactly like a fresh engine start:
        zeroed dilation FIFOs and silence-initialized symbol history — so
        with INJECTED selectors its samples bit-match a fresh run (verified:
        tests/test_engine.py::test_reset_utterances_continuous_batching).
        Default feed selectors and mode="prng" are keyed on the ABSOLUTE
        sample index, so a reset row draws a different (still reproducible)
        selector stream than a t=0 start — inject selectors to replay a
        served utterance exactly."""
        assert self._ring is not None, "no generation state yet"
        rows = list(rows)
        n = self._y_state.shape[1]   # global batch (state arrays are global)
        assert rows and all(0 <= r < n for r in rows), (
            f"rows {rows} out of range for batch {n}: XLA scatter silently "
            f"drops out-of-bounds indices, so an invalid slot would keep "
            f"the finished utterance's state")
        idx = jnp.asarray(rows, jnp.int32)
        sil = jnp.int32(self.cfg.silence_bin)
        self._ring = self._ring.at[:, idx, :].set(0)
        self._y_state = self._y_state.at[:, idx].set(sil)
        st = self._scan_state
        self._scan_state = st._replace(
            ring=st.ring.at[:, idx, :].set(0),
            y_prev=st.y_prev.at[idx].set(sil),
            y_cur=st.y_cur.at[idx].set(sil))
        if self._stream_t_row is not None and self.mesh is None:
            # the reset slot restarts its ABSOLUTE clock at 0, like a fresh
            # engine: its default selector stream and ring phase are those
            # of a new utterance (a zero ring is phase-free, so the stored
            # absolute convention is trivially consistent).  This desyncs
            # the row from its batchmates; subsequent feeds route through
            # the ragged kernel automatically — handover no longer waits
            # for a shared chunk boundary (VERDICT r4 #3).
            self._stream_t_row[list(rows)] = 0

    # ------------------------------------------------------------------
    # implementation selection
    # ------------------------------------------------------------------

    def _weight_bytes(self) -> int:
        return 2 if self.weight_dtype == jnp.bfloat16 else 4

    def _effective_chunk(self, batch, stream: bool = False,
                         dump: bool = False, forced: bool = False) -> int:
        """Largest chunk <= chunk_size whose double-buffered conditioning
        stream + weights + ring fit the VMEM budget (the planning analog of
        the reference's occupancy tuning, `README.md:66`).

        `dump` must match the run's dump_activations flag: dump runs fall
        back to the persistent kernel even when fuse_chain is set, so they
        must be planned against the persistent estimator (the fused one
        counts the G stack but not the dump output buffers).

        Clamped to a multiple of 8: the sel/y blocks are [chunk, B] and the
        TPU lowering requires the second-minor block dim to be a sublane
        multiple (interpret-mode tests don't enforce this; hardware does)."""
        wb = self._weight_bytes()
        b_dev = self._per_device(batch)
        if self._fuse_active(batch, stream, dump, forced):
            est = functools.partial(fused_chain.estimate_vmem_bytes,
                                    self.cfg, b_dev, weight_bytes=wb,
                                    forced=forced,
                                    pack_gates=self.fuse_pack)
        else:
            est = functools.partial(persistent.estimate_vmem_bytes,
                                    self.cfg, b_dev, weight_bytes=wb,
                                    stream=stream,
                                    stream_group_size=self.stream_group_size,
                                    forced=forced, dump=dump)
        chunk = max(8, self.chunk_size - self.chunk_size % 8)
        while chunk > 8 and est(chunk=chunk) > self.vmem_budget:
            chunk //= 2
        return max(8, chunk - chunk % 8)

    def _per_device(self, batch) -> int:
        """Per-chip batch: VMEM planning is per core, so the mesh divides the
        utterance batch before any estimate."""
        return batch // self.mesh.shape["data"] if self.mesh else batch

    def _fuse_active(self, batch, stream: bool, dump: bool,
                     forced: bool = False) -> bool:
        """Whether this dispatch uses the collapsed-chain kernel: fuse_chain
        requested, not a streaming/dump run, AND the fused plan (which adds
        the O(L^2 R^2/2) G stack over the persistent plan) fits the VMEM
        budget at the minimum chunk.  On large configs (e.g. 40L/128R) the
        fused plan can exceed VMEM where the persistent plan fits; silently
        routing to the fused kernel there fails the Pallas compile on VMEM
        overflow instead of generating — fall back to the exact kernel and
        say so once."""
        if not self.fuse_chain or stream or dump:
            return False
        est = fused_chain.estimate_vmem_bytes(
            self.cfg, self._per_device(batch), chunk=8,
            weight_bytes=self._weight_bytes(), forced=forced,
            pack_gates=self.fuse_pack)
        if est > self.vmem_budget:
            if not self._warned_fuse_vmem:
                print(f"note: fuse_chain disabled — fused plan needs "
                      f"~{est / 2**20:.0f} MB VMEM at the minimum chunk, "
                      f"budget is {self.vmem_budget / 2**20:.0f} MB; "
                      f"using the exact kernel", flush=True)
                self._warned_fuse_vmem = True
            return False
        return True

    def _resolve_impl(self, batch) -> Impl:
        impl = self.implementation
        if impl in (Impl.SINGLE_BLOCK, Impl.DUAL_BLOCK):
            return Impl.PERSISTENT
        if impl == Impl.AUTO:
            wb = self._weight_bytes()
            est = persistent.estimate_vmem_bytes(self.cfg,
                                                 self._per_device(batch),
                                                 self._effective_chunk(batch), wb)
            return Impl.PERSISTENT if est <= self.vmem_budget else Impl.MANYBLOCK
        return impl

    def set_temperature(self, temperature: float):
        """Change the sampling temperature (takes effect on the next
        dispatch).  Only the two output-layer tensors change, so only they
        re-upload (~(A*A+A)*4 bytes) — a full _invalidate would re-ship all
        weights and re-run the fused fold / cond prefold, which matters on
        a tunneled TPU where a serving loop may retune T per request."""
        assert temperature > 0, temperature
        if float(temperature) == self.temperature:
            return
        self.temperature = float(temperature)
        if self._params is None:
            return                      # next _device_params applies it
        inv_t = np.float32(1.0 / self.temperature)
        end_w = self._np_params["end_w"] * inv_t
        end_b = self._np_params["end_b"] * inv_t
        if self.mesh is not None and self._n_proc() > 1:
            self._params["end_w"] = self._shard(end_w, P(None, None))
            self._params["end_b"] = self._shard(end_b, P(None))
        else:
            self._params["end_w"] = jnp.asarray(end_w)
            self._params["end_b"] = jnp.asarray(end_b)
        self._params_cast = None        # derived copies pick up new values
        self._fused_prep = None
        self._spec_prep = None

    def _device_params(self, dtype=None):
        if self._params is None:
            src = self._np_params
            if self.temperature != 1.0:
                inv_t = np.float32(1.0 / self.temperature)
                src = dict(src)
                src["end_w"] = src["end_w"] * inv_t
                src["end_b"] = src["end_b"] * inv_t
            if self.mesh is not None and self._n_proc() > 1:
                # multihost: weights replicate (every process uploads the
                # same values) — the sharding analog of the reference's
                # rank-0 parameter broadcast (`distributed.py:100-103`)
                self._params = {
                    k: self._shard(v, P(*(None,) * np.ndim(v)))
                    for k, v in src.items()}
            else:
                self._params = {k: jnp.asarray(v)
                                for k, v in src.items()}
        if dtype is not None and dtype != jnp.float32:
            # weight-dtype cast for the HBM-streaming path: MANYBLOCK is
            # bound by per-step weight re-reads, so bf16 storage halves its
            # bandwidth (the persistent kernel casts internally)
            if self._params_cast is None:
                self._params_cast = {k: v.astype(dtype)
                                     for k, v in self._params.items()}
            return self._params_cast
        return self._params

    def _dil_b_folded(self):
        """dil_b as the kernel's weight upload would round it (bf16 weight
        storage rounds biases too): prefolding must add the SAME values the
        non-prefold path would, or the bf16-weights exact-match contract
        between PERSISTENT (prefolded) and MANYBLOCK (in-loop add) breaks."""
        b = self._device_params()["dil_b"]
        if self.weight_dtype != jnp.float32:
            b = b.astype(self.weight_dtype).astype(jnp.float32)
        return b

    def _interpret(self) -> bool:
        """Pallas kernels compile only for TPU; on a CPU backend (tests,
        development boxes) fall back to interpret mode automatically so the
        engine runs anywhere, like the reference's CPU golden path."""
        return self.interpret or jax.default_backend() == "cpu"

    def _effective_fast_math(self, dump: bool) -> bool:
        """fast_math for this dispatch: when priority="latency" turned it on,
        dump runs drop it (with fuse_chain) so the getter surface is the
        exact kernel; a caller-requested fast_math stays."""
        return self.fast_math and not (dump and self._fast_math_from_priority)

    def _persistent_gen(self, batch, mode, dump, stream=False, chunk=None):
        if chunk is None:
            chunk = self._effective_chunk(batch, stream, dump,
                                          forced=(mode == "forced"))
        fused = self._fuse_active(batch, stream, dump,
                                  forced=(mode == "forced"))
        quant = bool(self.stream_quant) and stream
        fast_math = self._effective_fast_math(dump)
        key = ("persistent", batch, chunk, mode, dump, stream, fused, quant,
               self.stream_group_size, self.stream_prefetch, self.fuse_pack)
        if key not in self._gen_cache:
            if self.mesh is not None:
                from nv_wavenet_tpu.parallel import mesh as mesh_lib
                self._gen_cache[key] = mesh_lib.make_sharded_persistent_generator(
                    self.cfg, self.mesh, self._per_device(batch), chunk,
                    mode=mode, weight_dtype=self.weight_dtype,
                    compute_dtype=self.compute_dtype,
                    interpret=self._interpret(), prefold_cond=True,
                    fast_math=fast_math, dump=dump,
                    stream_weights=stream,
                    stream_group_size=self.stream_group_size,
                    stream_prefetch=self.stream_prefetch,
                    stream_quant=quant,
                    fuse_chain=fused, fuse_pack=self.fuse_pack)
            elif fused:
                self._gen_cache[key] = jax.jit(
                    fused_chain.make_fused_generator(
                        self.cfg, batch, chunk, mode=mode,
                        weight_dtype=self.weight_dtype,
                        compute_dtype=self.compute_dtype,
                        interpret=self._interpret(),
                        fast_math=fast_math,
                        prefold_cond=True,
                        pack_gates=self.fuse_pack))
            else:
                self._gen_cache[key] = jax.jit(
                    persistent.make_persistent_generator(
                        self.cfg, batch, chunk, mode=mode, dump=dump,
                        weight_dtype=self.weight_dtype,
                        compute_dtype=self.compute_dtype,
                        interpret=self._interpret(),
                        fast_math=fast_math,
                        prefold_cond=True, stream_weights=stream,
                        stream_group_size=self.stream_group_size,
                        stream_prefetch=self.stream_prefetch,
                        stream_quant=quant))
        return self._gen_cache[key]

    # ------------------------------------------------------------------
    # generation (`nv_wavenet.cuh:636,:499,:445`)
    # ------------------------------------------------------------------

    def run(self, num_samples: int, batch_size: int,
            mode: str = "sample", dump_activations: bool = False) -> np.ndarray:
        """Generate `num_samples` for `batch_size` utterances.
        Returns y: [batch, num_samples] int32 mu-law bins."""
        return self.run_partial(0, num_samples, batch_size, mode,
                                dump_activations)

    def _run_partial_device(self, init_sample: int, num_samples: int,
                            batch_size: int, mode: str,
                            dump_activations: bool):
        """Dispatch generation of [init_sample, init_sample+num_samples) and
        return the DEVICE y array [T, B] (not fetched) — enables async
        pipelining of host readout against the next chunk's compute."""
        assert self._cond is not None, "set_inputs must be called first"
        B = batch_size
        sel = self._selectors[init_sample:init_sample + num_samples, :B]
        T = sel.shape[0]
        assert T == num_samples, "set_inputs cond is shorter than requested run"

        if init_sample == 0:
            self._reset_state(B)
        sl = slice(init_sample, init_sample + num_samples)
        # slice only the stream the resolved impl consumes: the scan path
        # (MANYBLOCK prng mode) reads raw cond; both kernels read the
        # dil_b-prefolded copy (built once per weights — float-exact,
        # removes a per-layer VPU add)
        impl = self._resolve_impl(B)
        if impl == Impl.MANYBLOCK and mode == "prng":
            cond, cond_pre = self._cond[sl, :, :B], None
        else:
            if self._cond_pre is None:
                self._cond_pre = (self._cond
                                  + self._dil_b_folded()[None, :, None, :])
            cond, cond_pre = None, self._cond_pre[sl, :, :B]
        return self._dispatch(impl, init_sample, cond, cond_pre, sel, B, mode,
                              dump_activations)

    def _dispatch(self, impl: Impl, t0: int, cond, cond_pre, sel, B: int,
                  mode: str, dump: bool):
        """Run the resolved implementation over chunk-local device inputs
        (cond raw for the scan path, cond_pre = dil_b-prefolded for the
        kernels), carrying generation state; t0 is the absolute index of the
        first sample (ring addressing + PRNG reseeds).  Returns device y
        [T, B].

        MANYBLOCK maps to the HBM-streaming Pallas kernel (per-layer weights
        double-buffered HBM->VMEM, `ops/persistent.py` stream_weights) —
        except mode="prng", which uses the XLA scan generator (its threefry
        draws run on any backend; kernel PRNG is TPU-hardware-only)."""
        T = sel.shape[0]
        if impl == Impl.MANYBLOCK and mode == "prng":
            scan_params = self._device_params(self.weight_dtype)
            if self.stream_quant:
                # value-identical oracle view of the int8-streamed stacks
                scan_params = persistent.dequantize_stream_params(scan_params)
            st, y, aux = scan_generate.generate(
                scan_params, self._scan_state,
                cond, sel, self.cfg, mode=mode, dump=dump,
                compute_dtype=self.compute_dtype, seed=self.sampling_seed)
            self._scan_state = st
            if dump:
                self._dumps = jax.tree.map(np.asarray, aux)
            return y.T  # [T, B] on device

        # fused kernel (VMEM-resident or HBM-streaming weights): pad T to a
        # chunk multiple; padded tail steps are masked in-kernel so carried
        # state stays exact at ragged boundaries
        stream = impl == Impl.MANYBLOCK
        fused = self._fuse_active(B, stream, dump, forced=(mode == "forced"))
        params = self._fused_weights() if fused else self._device_params()
        chunk = self._effective_chunk(B, stream, dump,
                                      forced=(mode == "forced"))
        pad = (-T) % chunk
        if pad:
            cond_pre = jnp.pad(cond_pre, ((0, pad), (0, 0), (0, 0), (0, 0)))
            sel = jnp.pad(sel, ((0, pad), (0, 0)))
        gen = self._persistent_gen(B, mode, dump, stream)
        if self.mesh is not None:
            out = gen(params, jnp.array([t0, T, self.sampling_seed],
                                        jnp.int32),
                      cond_pre, sel, self._ring, self._y_state)
        else:
            out = gen(params, np.array([t0]), cond_pre,
                      sel, self._ring, self._y_state, n_valid=T,
                      seed=self.sampling_seed)
        y, self._ring, self._y_state = out[0], out[1], out[2]
        if dump and len(out) > 3:
            if self._n_proc() > 1:
                # each process reads back its own utterances' activations
                from nv_wavenet_tpu.parallel import mesh as mesh_lib
                xt = mesh_lib.fetch_local(out[3], 1)
                skip = mesh_lib.fetch_local(out[4], 1)
                zs, za, p = [mesh_lib.fetch_local(o, 0) for o in out[5:8]]
            else:
                xt, skip, zs, za, p = [np.asarray(o) for o in out[3:]]
            self._dumps = {"xt": xt, "skip": skip, "zs": zs, "za": za, "p": p}
        return y[:T]

    def run_device(self, num_samples: int, batch_size: int,
                   mode: str = "sample"):
        """Like `run` but returns the DEVICE array [T, B] without fetching —
        for callers that keep post-processing on device (e.g. mu-law decode,
        vocoder chaining) or amortize host readout themselves.  Forcing a
        host fetch of multi-MB outputs is expensive over a tunneled TPU."""
        return self._run_partial_device(0, num_samples, batch_size, mode, False)

    def _fetch_y(self, y_dev) -> np.ndarray:
        """Host copy of device y [T, B] -> [B, T].  Under multihost each
        process reads back its OWN utterances ([B_local, T]) — per-rank
        output ownership, like the reference's per-GPU engines."""
        if self.mesh is not None and self._n_proc() > 1:
            from nv_wavenet_tpu.parallel import mesh as mesh_lib
            return mesh_lib.fetch_local(y_dev, batch_axis=1).T
        return np.asarray(y_dev).T

    def run_partial(self, init_sample: int, num_samples: int, batch_size: int,
                    mode: str = "sample", dump_activations: bool = False
                    ) -> np.ndarray:
        """Generate [init_sample, init_sample+num_samples); carried state
        makes chunked calls equal one full run."""
        y = self._run_partial_device(init_sample, num_samples, batch_size,
                                     mode, dump_activations)
        return self._fetch_y(y)

    def begin_stream(self, batch_size: int):
        """Start incremental generation: conditioning arrives chunk-by-chunk
        through `feed` (the way a TTS frontend produces it), instead of all
        upfront through `set_inputs` (the reference's only mode,
        `nv_wavenet.cuh:417`).  Generation state resets to silence."""
        assert batch_size <= self.max_batch
        self._check_mesh_batch(batch_size)
        self._reset_state(batch_size)
        self._stream_t = 0
        self._stream_batch = batch_size
        # per-row absolute clocks (ragged feeds / slot handover may desync
        # rows); _stream_t stays their max for the aligned-only surfaces
        self._stream_t_row = np.zeros(batch_size, np.int64)

    def feed(self, cond_chunk: np.ndarray,
             selectors_chunk: Optional[np.ndarray] = None,
             mode: str = "sample",
             lengths=None) -> np.ndarray:
        """Generate len(cond_chunk) samples continuing the stream; returns
        y [batch, n] int32.  Chunk lengths may vary call-to-call and need not
        align to the kernel chunk (in-kernel n_valid masking keeps carried
        state exact at ragged boundaries).  Equivalent to one full run over
        the concatenated conditioning: injected selectors are exact by the
        carried-state contract, and DEFAULT selectors are drawn from one
        logical stream keyed on the ABSOLUTE sample index (like mode="prng"),
        so the generated audio is invariant to how the caller chunks the
        conditioning — AND identical to `set_inputs(selectors=None)` +
        `run()` over the same window (one default stream across input
        modes; a served utterance replays through run() directly).

        PER-ROW ragged feeds (VERDICT r4 #3 — true continuous batching):
        `lengths` [batch] gives each row its OWN number of valid steps this
        call (0 allowed: a stalled frontend doesn't stall its batchmates).
        Row b consumes cond_chunk[:lengths[b], :, b] and advances its own
        absolute clock; its samples (y[b, :lengths[b]]; the tail is zero
        padding) bit-match the row generated alone — desynced streams
        coexist in one batch, and `reset_utterances` slot handover no
        longer waits for the slowest stream.  Default selectors stay
        per-row-clock keyed, so raggedness never changes what a row
        generates.  Single-process engines; mode='sample' only."""
        return self._fetch_y(self.feed_device(cond_chunk, selectors_chunk,
                                              mode, lengths))

    def feed_device(self, cond_chunk,
                    selectors_chunk: Optional[np.ndarray] = None,
                    mode: str = "sample",
                    lengths=None):
        """`feed` without the host readout: returns the DEVICE y [n, batch].
        A serving loop that post-processes on device (mu-law decode) or
        pipelines readout against the next chunk's compute avoids one
        synchronous device->host round trip per feed — the streaming analog
        of `run_device` (and of the reference's copy-stream overlap in
        `run_chunks`, `nv_wavenet.cuh:445-497`).  `cond_chunk` may already
        be a device array (e.g. produced by an on-device vocoder frontend);
        host arrays are staged as in `feed`."""
        assert self._stream_t is not None, (
            "call begin_stream(batch_size) first")
        B = self._stream_batch
        T, L, Bc, C = cond_chunk.shape
        assert (Bc * self._n_proc() == B and L == self.cfg.num_layers
                and C == 2 * self.cfg.R)
        if T == 0:
            # a frontend may legitimately produce no frames this tick; the
            # kernel grid (and the feed chunk clamp) need T >= 1
            return jnp.zeros((0, Bc), jnp.int32)
        aligned = (self._stream_t_row is None
                   or bool(np.all(self._stream_t_row
                                  == self._stream_t_row[0])))
        if lengths is not None or not aligned:
            la = (np.full(B, T, np.int64) if lengths is None
                  else np.asarray(lengths, np.int64))
            if not (aligned and la.min() == la.max() == T):
                # per-row ragged feed, or rows already desynced (a lockstep
                # kernel shares one ring phase across the batch)
                return self._feed_ragged(cond_chunk, selectors_chunk, mode,
                                         la)
        if selectors_chunk is None:
            if mode == "sample":
                pidx = jax.process_index() if self.mesh is not None else 0
                selectors_chunk = _selector_stream(
                    self.sampling_seed, self._stream_t, T, Bc, pidx)
            else:
                selectors_chunk = np.zeros((T, Bc), np.float32)
        # stage the chunk on device (sharded under a mesh), keeping the
        # carried generation state (set_inputs would reset it)
        impl = self._resolve_impl(B)
        t0 = self._stream_t
        self._stream_t += T
        if self._stream_t_row is not None:
            self._stream_t_row += T
        if self.mesh is None and not (impl == Impl.MANYBLOCK
                                      and mode == "prng"):
            # serving fast path: ONE dispatch per feed (see _feed_dispatch)
            return self._feed_dispatch(impl, t0, cond_chunk, selectors_chunk,
                                       B, mode)
        cond = self._shard(jnp.asarray(cond_chunk, jnp.float32),
                           P(None, None, "data", None))
        sel = self._shard(jnp.asarray(selectors_chunk, jnp.float32),
                          P(None, "data"))
        cond_pre = None
        if not (impl == Impl.MANYBLOCK and mode == "prng"):
            cond_pre = cond + self._dil_b_folded()[None, :, None, :]
        return self._dispatch(impl, t0, cond, cond_pre, sel, B, mode, False)

    def _feed_dispatch(self, impl: Impl, t0: int, cond, sel, B: int,
                       mode: str):
        """Single-dispatch feed: the dil_b prefold, chunk padding, param-block
        assembly and kernel launch fuse into ONE cached jitted callable, so a
        serving loop pays one host->device dispatch per feed instead of ~6
        (measured over the tunneled TPU: per-op dispatch latency dominated
        the per-feed cost at conversational chunk sizes — tools/
        feed_latency.py).  Single-process engines only; the mesh path keeps
        the staged-sharding dispatch."""
        T = int(sel.shape[0]) if hasattr(sel, "shape") else len(sel)
        stream = impl == Impl.MANYBLOCK
        pk = (T, B, mode, stream)
        plan = self._feed_plan.get(pk)
        if plan is None:
            forced = mode == "forced"
            fused = self._fuse_active(B, stream, False, forced=forced)
            # clamp the kernel chunk to the feed size: a 40-sample feed must
            # not pad to a 256-step grid iteration (5/6 of the steps would be
            # masked no-ops the sequential fori still walks through)
            chunk = min(self._effective_chunk(B, stream, False, forced=forced),
                        -(-T // 8) * 8)
            plan = self._feed_plan[pk] = (fused, chunk)
        fused, chunk = plan
        key = ("feed", T, B, mode, stream, fused, chunk)
        if key not in self._feed_cache:
            gen = self._persistent_gen(B, mode, False, stream, chunk=chunk)
            pad = (-T) % chunk

            def f(params, dil_b, cond, sel, ring, y_state, t0s):
                cond_pre = (jnp.asarray(cond, jnp.float32)
                            + dil_b[None, :, None, :])
                sel = jnp.asarray(sel, jnp.float32)
                if pad:
                    cond_pre = jnp.pad(
                        cond_pre, ((0, pad), (0, 0), (0, 0), (0, 0)))
                    sel = jnp.pad(sel, ((0, pad), (0, 0)))
                out = gen(params, t0s[:1], cond_pre, sel, ring, y_state,
                          n_valid=T, seed=t0s[1])
                # trim padding INSIDE the jit: a host-side y[:T] dispatches
                # an extra tiny slice executable per feed (measured on the
                # per-feed serving hot path)
                return (out[0][:T],) + tuple(out[1:])

            self._feed_cache[key] = jax.jit(f, donate_argnums=(4, 5))
        params = self._fused_weights() if fused else self._device_params()
        out = self._feed_cache[key](
            params, self._dil_b_folded(), cond, sel, self._ring,
            self._y_state, np.asarray([t0, self.sampling_seed], np.int32))
        y, self._ring, self._y_state = out[0], out[1], out[2]
        return y

    def _feed_ragged(self, cond, sel, mode: str, lengths: np.ndarray):
        """Per-row ragged feed (see `feed`): each row consumes its own
        prefix lengths[b] of the chunk and advances its own absolute clock.

        Kernel side (`ops/persistent.py` ragged=True): a per-row validity
        vector gates every state write, and ring addressing is CALL-LOCAL —
        the per-row ABSOLUTE phase difference lives entirely in two
        `rotate_ring_phase` gathers inside this one jitted dispatch (entry:
        stored absolute -> call-local; exit: back), so the kernel's
        per-step loop is exactly the lockstep kernel's, with no per-row
        dynamic indexing on the sample chain."""
        if self.mesh is not None:
            raise ValueError(
                "ragged feeds: single-process engines only (shard desynced "
                "streams across engine instances; in-batch rows shard on "
                "one chip)")
        if mode != "sample":
            raise ValueError(
                "ragged feeds: mode='sample' only (prng/forced are keyed "
                "on one shared absolute clock)")
        B = self._stream_batch
        T = cond.shape[0]
        if not (lengths.shape == (B,) and lengths.min() >= 0
                and lengths.max() <= T):
            raise ValueError(
                f"ragged feed lengths {lengths} must be [batch={B}] with "
                f"0 <= n <= cond length {T}")
        if lengths.max() == 0:
            return jnp.zeros((0, B), jnp.int32)
        impl = self._resolve_impl(B)
        if impl == Impl.MANYBLOCK:
            raise ValueError(
                "ragged feeds need the VMEM-resident persistent kernel; "
                "this config streams weights from HBM (MANYBLOCK)")
        if sel is None:
            sel = _selector_stream(self.sampling_seed, self._stream_t_row,
                                   T, B)
        chunk = min(self._effective_chunk(B, False, False), -(-T // 8) * 8)
        key = ("feedrag", T, B, chunk)
        if key not in self._feed_cache:
            gen = persistent.make_persistent_generator(
                self.cfg, B, chunk, mode="sample",
                weight_dtype=self.weight_dtype,
                compute_dtype=self.compute_dtype,
                interpret=self._interpret(),
                fast_math=self._effective_fast_math(False),
                prefold_cond=True, ragged=True)
            pad = (-T) % chunk

            def f(params, dil_b, cond, sel, ring, y_state, t0_row, nvr):
                cond_pre = (jnp.asarray(cond, jnp.float32)
                            + dil_b[None, :, None, :])
                sel = jnp.asarray(sel, jnp.float32)
                if pad:
                    cond_pre = jnp.pad(
                        cond_pre, ((0, pad), (0, 0), (0, 0), (0, 0)))
                    sel = jnp.pad(sel, ((0, pad), (0, 0)))
                ring_l = persistent.rotate_ring_phase(self.cfg, ring,
                                                      t0_row, +1)
                y, ring_l, ys = gen(params, jnp.zeros(1, jnp.int32),
                                    cond_pre, sel, ring_l, y_state,
                                    n_valid=jnp.max(nvr), n_valid_row=nvr)
                ring_a = persistent.rotate_ring_phase(self.cfg, ring_l,
                                                      t0_row, -1)
                return y[:T], ring_a, ys

            self._feed_cache[key] = jax.jit(f, donate_argnums=(4, 5))
        out = self._feed_cache[key](
            self._device_params(), self._dil_b_folded(), cond, sel,
            self._ring, self._y_state,
            np.asarray(self._stream_t_row, np.int32),
            np.asarray(lengths, np.int32))
        y, self._ring, self._y_state = out
        self._stream_t_row = self._stream_t_row + lengths
        self._stream_t = int(self._stream_t_row.max())
        return y

    def run_speculative(self, num_samples: int, batch_size: int,
                        window: int = 256,
                        adaptive: bool = True) -> np.ndarray:
        """Exact-contract sampling via SPECULATIVE EXACT DECODE
        (ops/speculative): draft `window` steps with the fused fast kernel,
        verify them in one time-parallel pass of the exact scorer, commit
        the agreeing prefix + the exact correction token.  The returned
        samples BIT-MATCH `run(num_samples, batch_size)` (mode="sample",
        injected selectors) — the draft only affects speed.  Defined for
        the DETERMINISTIC decode tiers only (exact fp32 and bf16 weights);
        raises ValueError on fast_math / fuse_chain / priority="latency" /
        bf16-compute engines, whose run() is TV-bounded.  A latency-tier
        feature: the whole batch commits in lockstep at the first
        disagreement of any row, so speedup decays with batch; use
        batch_size=1 (or small) where single-stream rate matters.

        adaptive=True (the default) makes the tier SELF-GOVERNING
        (ops/speculative.make_adaptive_generator): a short on-device probe
        measures the draft's committed-run length and the remainder runs on
        the fastest of {speculative@window, @window/2, the exact kernel} —
        so serving callers never lose ~2x to run() on trained (peaked)
        checkpoints where drafts flip every ~35 steps (`hw_r04.log` H1),
        while cold/flat distributions keep the speculative win.  The
        decision never affects output bits, only speed; the cost model is
        `self.spec_cost_model` (V0_us, V1_us, E0_us — speculative round
        cost ~ V0+V1*K vs exact per-step E0; defaults measured on flagship
        b=1).  `spec_branch` afterwards holds the chosen branch (0=window,
        1=window/2, 2=exact fallback, -1=run too short to probe, None for
        adaptive=False).  adaptive=False is the raw fixed-window tier.

        `spec_rounds` afterwards holds the number of draft-verify rounds
        (num_samples/spec_rounds ~ average committed run length).
        The fixed-tier window=256 default is the measured b=1 flagship
        optimum (126.5 kHz/utt vs 115.5 exact, BASELINE.md speculative
        table); below ~128 the per-round verify/commit overhead dominates."""
        y, rounds = self._run_speculative_device(num_samples, batch_size,
                                                 window, adaptive)
        self.spec_rounds = int(rounds)
        return np.asarray(y).T

    def _run_speculative_device(self, num_samples: int, batch_size: int,
                                window: int = 256, adaptive: bool = False):
        """`run_speculative` without host readout: returns DEVICE
        (y [T, B], rounds) — perf harnesses tail-fetch y themselves."""
        if self._cond is None:
            raise ValueError("set_inputs must be called first")
        if self.mesh is not None:
            raise ValueError(
                "speculative decode: single-process engines only (its "
                "lockstep commit is a per-batch scalar loop; at multi-chip "
                "batch the exact kernel wins anyway — BASELINE.md)")
        # the bit-match-vs-run() contract requires run() itself to be on a
        # DETERMINISTIC path: the exact kernel, or the bf16-weights tier
        # (rounded storage, canonical fp32 compute).  fast_math / fuse_chain
        # (incl. priority="latency") / bf16 compute make run() TV-bounded —
        # no drafted+verified sequence can bit-match those.
        if self.fast_math or self.fuse_chain or self.compute_dtype != jnp.float32:
            raise ValueError(
                "run_speculative requires a deterministic engine decode "
                "path (no fast_math / fuse_chain / priority='latency' / "
                "bf16 compute) — its output bit-matches run(), which is "
                "only defined for the exact and bf16-weights tiers")
        B = batch_size
        sel = self._selectors[:num_samples, :B]
        cond = self._cond[:num_samples, :, :B]
        if not (sel.shape[0] == num_samples and cond.shape[0] == num_samples):
            raise ValueError(
                f"set_inputs holds {self._cond.shape[0]} steps of "
                f"conditioning; cannot generate {num_samples}")
        self._reset_state(B)
        from nv_wavenet_tpu.ops import speculative
        if adaptive:
            key = ("spec_adaptive", num_samples, B, window,
                   tuple(self.spec_cost_model))
            if key not in self._gen_cache:
                self._gen_cache[key] = jax.jit(
                    speculative.make_adaptive_generator(
                        self.cfg, B, window,
                        chunk=self._effective_chunk(B, False, False),
                        cost=self.spec_cost_model,
                        interpret=self._interpret()))
        else:
            key = ("spec", num_samples, B, window)
            if key not in self._gen_cache:
                self._gen_cache[key] = jax.jit(
                    speculative.make_speculative_generator(
                        self.cfg, B, window, interpret=self._interpret()))
        if self._spec_prep is None:
            # the draft kernel's weight fold (prefold_cond=False: raw cond),
            # once per weight upload like _fused_weights
            self._spec_prep = jax.jit(
                lambda p: fused_chain.prepare_weights(p, self.cfg, False)
            )(self._device_params())
        # verify-path params in the engine's WEIGHT dtype: the scorer
        # upcasts storage to fp32 (exact), so bf16-weights engines verify
        # with the same rounded weights their kernels compute with and the
        # bit-match-vs-run() contract extends to that deterministic tier
        out = self._gen_cache[key](
            self._device_params(self.weight_dtype), self._spec_prep,
            np.array([0]), cond, sel, self._ring, self._y_state)
        y, self._ring, self._y_state, rounds = out[:4]
        # keep the branch as a DEVICE scalar: an int() here would force a
        # sync inside perf's timed dispatch loops; `spec_branch` fetches
        self._spec_branch_dev = out[4] if adaptive else None
        return y, rounds

    @property
    def spec_branch(self) -> Optional[int]:
        """Branch the last ADAPTIVE run_speculative picked: 0=window,
        1=window/2, 2=exact-kernel fallback, -1=run too short to probe;
        None when the last call was the fixed tier (adaptive=False)."""
        if self._spec_branch_dev is None:
            return None
        return int(self._spec_branch_dev)

    def score_device(self, cond_chunk, y_chunk):
        """Teacher-forced scoring of a KNOWN symbol window, continuing the
        stream: returns the DEVICE per-step probability sequence [T, B, A]
        and advances the carried generation state exactly as if the engine
        had GENERATED y_chunk (score->generate handoffs are exact, so a
        serving loop can interleave scoring and generation freely).

        Computed by the TIME-PARALLEL scorer (ops/score_parallel): teacher
        forcing has no sequential dependence, so the window batches through
        [T*B, C] MXU matmuls — orders of magnitude faster than the
        sequential forced mode, with bit-identical per-step math (the
        canonical order).  Call `begin_stream` first; y_chunk [T, B] (or
        [B, T] via score()).  Under a temperature transform the returned p
        is the TEMPERED distribution, like the kernels' forced mode.  No
        reference analog: the reference can only score via its training
        model from t=0 (`pytorch/wavenet.py:102-145`); this scores
        mid-stream from any generation state.

        MESH-capable like run/feed (the scorer is batch-parallel by
        construction — its [T*B, C] matmuls shard on B with zero
        cross-chip traffic): under a mesh, cond_chunk/y_chunk are this
        process's batch shard and the returned p_seq is batch-sharded the
        same way (multihost callers read their own utterances' rows, as
        with set_inputs)."""
        if self._stream_t is None:
            raise ValueError("call begin_stream(batch_size) first")
        if (self._stream_t_row is not None
                and not np.all(self._stream_t_row == self._stream_t)):
            raise ValueError(
                "score_device: rows are desynced (ragged feeds / slot "
                "handover); the time-parallel scorer shares one absolute "
                "clock — realign rows or score per-row via a fresh engine")
        B = self._stream_batch
        T, L, Bc, C = cond_chunk.shape
        if not (Bc * self._n_proc() == B and L == self.cfg.num_layers
                and C == 2 * self.cfg.R):
            raise ValueError(
                f"score_device: cond_chunk shape {cond_chunk.shape} does not "
                f"match stream batch {B} / config (L={self.cfg.num_layers}, "
                f"2R={2 * self.cfg.R})")
        if np.shape(y_chunk) != (T, Bc):
            raise ValueError(f"score_device: y_chunk shape "
                             f"{np.shape(y_chunk)} != {(T, Bc)}")
        if self.mesh is not None:
            cond_chunk = self._shard(jnp.asarray(cond_chunk, jnp.float32),
                                     P(None, None, "data", None))
            y_chunk = self._shard(jnp.asarray(y_chunk, jnp.int32),
                                  P(None, "data"))
        key = ("score", T, B)
        if key not in self._feed_cache:
            from nv_wavenet_tpu.ops import score_parallel
            scorer = score_parallel.make_parallel_scorer(
                self.cfg, B, compute_dtype=self.compute_dtype,
                prefold_cond=True)

            def f(params, dil_b, cond, y, ring, y_state, t0s):
                cond_pre = (jnp.asarray(cond, jnp.float32)
                            + dil_b[None, :, None, :])
                return scorer(params, t0s[:1], cond_pre, y, ring, y_state)

            self._feed_cache[key] = jax.jit(f, donate_argnums=(4, 5))
        # weight-dtype'd params: the scorer upcasts storage to fp32, so a
        # bf16-weights engine's carried ring/y_state is computed with the
        # SAME rounded weights its generation kernels use — without this the
        # score->feed handoff silently diverges on that (deterministic) tier
        out = self._feed_cache[key](
            self._device_params(self.weight_dtype), self._dil_b_folded(),
            cond_chunk, jnp.asarray(y_chunk, jnp.int32), self._ring,
            self._y_state, np.asarray([self._stream_t, 0], np.int32))
        p_seq, self._ring, self._y_state = out
        self._stream_t += T
        return p_seq

    def score(self, cond_chunk, y_chunk) -> np.ndarray:
        """`score_device` with host readout and reference-style batch-major
        symbols: y_chunk [B, T] int32 -> p_seq [B, T, A] numpy."""
        p = self.score_device(cond_chunk, np.asarray(y_chunk).T)
        return np.transpose(np.asarray(p), (1, 0, 2))

    def run_chunks(self, chunk_size: int, consume: Callable, num_samples: int,
                   batch_size: int, mode: str = "sample",
                   dump_activations: bool = False) -> np.ndarray:
        """Chunked generation with a host consume callback per chunk —
        `run_chunks` parity (`nv_wavenet.cuh:445-497`, incl. the
        dumpActivations flag `nv_wavenet.cuh:446`).  The callback receives
        (y_chunk [B, n], sample_offset, n).  With dump_activations=True the
        getter surface reflects the run's FINAL sample afterwards — identical
        to a single dump run of num_samples (carried state is exact across
        chunk boundaries), like the reference equivalence test that drives
        dumps through chunked runs.

        Compute/readout overlap (the reference's dual-stream + event scheme,
        P8): chunk i+1's kernel is DISPATCHED before chunk i's samples are
        fetched to the host, so JAX's async dispatch overlaps the device->host
        copy + consume callback with the next chunk's generation."""
        ys = []
        pending = []  # (device_y, offset, n)
        off = 0
        while off < num_samples:
            n = min(chunk_size, num_samples - off)
            y_dev = self._run_partial_device(off, n, batch_size, mode,
                                             dump_activations)
            pending.append((y_dev, off, n))
            off += n
            while len(pending) > 1:
                yd, o, k = pending.pop(0)
                y_host = self._fetch_y(yd)
                consume(y_host, o, k)
                ys.append(y_host)
        for yd, o, k in pending:
            y_host = self._fetch_y(yd)
            consume(y_host, o, k)
            ys.append(y_host)
        return np.concatenate(ys, axis=1)

    # ------------------------------------------------------------------
    # activation getters (dump mode, `nv_wavenet.cuh:424-444`)
    # ------------------------------------------------------------------

    def _dump(self, key):
        assert self._dumps is not None, (
            "run with dump_activations=True before reading activations")
        return self._dumps[key]

    def get_xt_out(self, layer: int) -> np.ndarray:
        return self._dump("xt")[layer]

    def get_skip_out(self, layer: int) -> np.ndarray:
        return self._dump("skip")[layer]

    def get_zs(self) -> np.ndarray:
        return self._dump("zs")

    def get_za(self) -> np.ndarray:
        return self._dump("za")

    def get_p(self) -> np.ndarray:
        return self._dump("p")
