"""Training stack: teacher-forced WaveNet training with data-parallel (and
optional tensor-parallel) sharding, checkpoints, and engine export.

Functional parity with the reference trainer (`/root/reference/pytorch/train.py`
+ `pytorch/distributed.py`), redesigned TPU-first:

  * the reference's multi-process NCCL data parallelism with hand-rolled
    bucketed gradient allreduce (`distributed.py:90-142`) becomes a sharded
    `jit` over a `jax.sharding.Mesh`: batch sharded on the 'data' axis, XLA
    inserts the gradient all-reduce over ICI automatically — no hooks, no
    buckets, no rendezvous,
  * rank-0 parameter broadcast (`distributed.py:100-103`) is replaced by
    replicated parameter sharding,
  * checkpoint/resume (model + optimizer + iteration,
    `train.py:62-81,149-154`) uses orbax,
  * CE loss over A mu-law classes with the one-sample output shift
    (`train.py:43-60`), Adam optimizer (`train.py:100`).

The optional 'model' mesh axis tensor-parallel-shards the widest weights (the
per-layer conditioning projection and the skip/output stacks) — capability
the reference does not have (SURVEY §2.5 P10: TP absent).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nv_wavenet_tpu.models.wavenet import WaveNetTrain


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-3
    batch_size: int = 4
    seed: int = 1234
    iters_per_checkpoint: int = 1000
    # NOTE: the epoch/dataset-pass schedule is config-level, not a trainer
    # knob — `train.cli` turns config "epochs" into num_iters + an
    # epoch_batches iterator (data.py), so there is deliberately no `epochs`
    # field here (trainer.train consumes an iterator + num_iters only)
    # parity with the reference's `with_tensorboard` flag (`train.py:83`):
    # when set, per-iteration scalars additionally stream to
    # <ckpt_dir>/metrics.jsonl (a TensorBoard-free structured sink)
    with_tensorboard: bool = False


class TrainState(train_state.TrainState):
    pass


def cross_entropy_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """CE over A classes; logits [B, T, A], targets [B, T] int
    (`pytorch/train.py:43-60` CrossEntropyLoss semantics)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return -jnp.mean(ll)


def create_model(wavenet_config: Dict[str, Any]) -> WaveNetTrain:
    """Build from a config dict with the reference's key names
    (`pytorch/config.json` wavenet_config section)."""
    return WaveNetTrain(
        n_in_channels=wavenet_config.get("n_in_channels", 256),
        n_layers=wavenet_config.get("n_layers", 16),
        max_dilation=wavenet_config.get("max_dilation", 128),
        n_residual_channels=wavenet_config.get("n_residual_channels", 64),
        n_skip_channels=wavenet_config.get("n_skip_channels", 256),
        n_out_channels=wavenet_config.get("n_out_channels", 256),
        n_cond_channels=wavenet_config.get("n_cond_channels", 80),
        upsamp_window=wavenet_config.get("upsamp_window", 800),
        upsamp_stride=wavenet_config.get("upsamp_stride", 200),
        # "highest" = exact fp32 (the train<->infer exact-equivalence
        # contract); "default" = single-pass bf16-input MXU matmuls for
        # faster training at reduced precision
        precision=wavenet_config.get("precision", "highest"),
    )


def create_train_state(model: WaveNetTrain, train_cfg: TrainConfig,
                       sample_mel: np.ndarray, sample_audio: np.ndarray
                       ) -> TrainState:
    rng = jax.random.PRNGKey(train_cfg.seed)
    params = model.init(rng, jnp.asarray(sample_mel), jnp.asarray(sample_audio))
    tx = optax.adam(train_cfg.learning_rate)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def train_step(state: TrainState, mel: jax.Array, audio: jax.Array
               ) -> Tuple[TrainState, jax.Array]:
    def loss_fn(params):
        logits = state.apply_fn(params, mel, audio)
        return cross_entropy_loss(logits, audio)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    return state.apply_gradients(grads=grads), loss


# ---------------------------------------------------------------------------
# sharding
# ---------------------------------------------------------------------------

def make_mesh(data: int, model: int = 1, seq: int = 1,
              devices: Optional[list] = None) -> Mesh:
    """Training mesh: 'data' shards the utterance batch, 'model'
    tensor-parallel-shards the wide projections, 'seq' shards the TIME axis
    of the (long) audio/mel segments — sequence parallelism the reference
    has no analog of (its segments live whole on one GPU).  'data' is the
    outermost axis so it spans processes on multi-host topologies."""
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= data * model * seq, (
        f"need {data * model * seq} devices, have {len(devices)}")
    dev = np.asarray(devices[:data * model * seq]).reshape(data, model, seq)
    return Mesh(dev, ("data", "model", "seq"))


def batch_partition_spec(mesh: Mesh, time_dim: Optional[int] = None) -> P:
    """PartitionSpec for [B, T, ...] batch tensors (mel and audio both carry
    time on dim 1): batch on 'data', time on 'seq' when the mesh has one.
    XLA partitions the dilated convs spatially (halo exchange on segment
    edges) and the loss reduction with a psum — no hand-written collectives.

    When `time_dim` is given and does not divide by the seq axis, time stays
    unsharded for that tensor (device_put requires divisibility): audio
    segments are power-of-two-friendly, but the mel FRAME count is usually
    odd (T/hop + 1) — the mel tensor is tiny, the conv stack over the
    upsampled T carries the SP win."""
    if "seq" in mesh.axis_names and mesh.shape["seq"] > 1 and (
            time_dim is None or time_dim % mesh.shape["seq"] == 0):
        return P("data", "seq")
    return P("data")


def param_partition_spec(path_tuple, leaf) -> P:
    """Tensor-parallel rules for the 'model' axis: shard the widest
    projections on their output-channel dim; everything else replicated."""
    path = "/".join(str(getattr(k, "key", k)) for k in path_tuple)
    if leaf.ndim == 0:
        return P()
    if "cond_layer/kernel" in path:
        return P(None, None, "model")     # [1, n_cond, 2R*L]
    if "skip_" in path and path.endswith("kernel"):
        return P(None, None, "model")     # [1, R, S]
    if "skip_" in path and path.endswith("bias"):
        return P("model")
    if "conv_out/kernel" in path:
        return P(None, "model", None)     # [1, S, A] contract over sharded S
    return P()


def shard_train_state(state: TrainState, mesh: Mesh) -> Tuple[TrainState, Any]:
    """Place params (TP rules on 'model', replicated over 'data' — the pjit
    analog of the reference's rank-0 broadcast) and re-derive the optimizer
    state under jit so adam's mu/nu inherit the parameter shardings."""
    param_specs = jax.tree_util.tree_map_with_path(
        lambda p, x: param_partition_spec(p, x), state.params)
    param_shardings = jax.tree.map(lambda spec: NamedSharding(mesh, spec),
                                   param_specs,
                                   is_leaf=lambda x: isinstance(x, P))
    params = jax.tree.map(jax.device_put, state.params, param_shardings)
    opt_state = jax.jit(state.tx.init)(params)
    placed = TrainState(
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
        apply_fn=state.apply_fn,
        params=params,
        tx=state.tx,
        opt_state=opt_state,
    )
    return placed, param_shardings


def make_sharded_train_step(mesh: Mesh):
    """Data-parallel (+TP, +SP) train step: batch sharded on 'data' (and the
    time axis on 'seq' when present); gradient all-reduce + TP/SP collectives
    inserted by XLA over ICI."""
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, mel, audio):
        return train_step(state, mel, audio)

    def run(state, mel, audio):
        mel = jnp.asarray(mel)
        audio = jnp.asarray(audio)
        mel = jax.device_put(mel, NamedSharding(
            mesh, batch_partition_spec(mesh, mel.shape[1])))
        audio = jax.device_put(audio, NamedSharding(
            mesh, batch_partition_spec(mesh, audio.shape[1])))
        return step(state, mel, audio)

    return run


# ---------------------------------------------------------------------------
# checkpointing (orbax), `train.py:62-81` parity
# ---------------------------------------------------------------------------

def save_checkpoint(ckpt_dir: str, state: TrainState, iteration: int):
    import orbax.checkpoint as ocp
    path = f"{ckpt_dir}/it_{iteration}"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": state.params,
                      "opt_state": state.opt_state,
                      "step": np.asarray(iteration)},
               force=True)
    ckptr.wait_until_finished()


def load_checkpoint(ckpt_dir: str, iteration: int, state: TrainState
                    ) -> Tuple[TrainState, int]:
    import os

    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    target = {"params": state.params, "opt_state": state.opt_state,
              "step": np.asarray(0)}
    if iteration is None:  # latest
        its = sorted(int(d.split("_")[1]) for d in os.listdir(ckpt_dir)
                     if d.startswith("it_"))
        assert its, f"no it_* checkpoints under {ckpt_dir}"
        iteration = its[-1]
    path = os.path.abspath(os.path.join(ckpt_dir, f"it_{iteration}"))
    restored = ckptr.restore(path, target=target)
    new_state = state.replace(params=restored["params"],
                              opt_state=restored["opt_state"],
                              step=int(restored["step"]))
    return new_state, int(restored["step"])


# ---------------------------------------------------------------------------
# training loop
# ---------------------------------------------------------------------------

def train(model: WaveNetTrain, train_cfg: TrainConfig,
          batches: Iterator[Tuple[np.ndarray, np.ndarray]],
          num_iters: int, mesh: Optional[Mesh] = None,
          ckpt_dir: Optional[str] = None,
          log_every: int = 1,
          resume_dir: Optional[str] = None,
          resume_iteration: int = 0) -> Tuple[TrainState, list]:
    """Run steps [start, num_iters); returns (final_state, loss_history).
    Per-iteration loss printing mirrors `train.py:147`; checkpoint resume
    restores model+optimizer+iteration and continues at iteration+1
    (`train.py:62-71,102-107,127`)."""
    mel0, audio0 = next(batches)
    state = create_train_state(model, train_cfg, mel0, audio0)
    start_iter = 0
    if resume_dir:
        state, it = load_checkpoint(resume_dir, resume_iteration, state)
        start_iter = it
        print(f"resumed from {resume_dir} at iteration {it}", flush=True)
    if mesh is not None:
        state, _ = shard_train_state(state, mesh)
        step_fn = make_sharded_train_step(mesh)
    else:
        step_fn = jax.jit(train_step, donate_argnums=(0,))

    # losses are kept as device scalars and fetched lazily: a float() per
    # iteration would synchronize the async dispatch pipeline every step
    # (one host round-trip each — expensive over a tunneled TPU); with
    # log_every=1 the print itself forces the fetch, matching the
    # reference's per-iteration print (`train.py:147`)
    losses = []
    shard_fn = None
    if mesh is not None:
        from nv_wavenet_tpu.parallel import mesh as mesh_lib
        # multihost-correct staging: each process contributes its LOCAL
        # batch shard (per-rank data ownership, like the reference's
        # DistributedSampler); single-process = plain sharded device_put
        shard_fn = lambda a: mesh_lib.stage(  # noqa: E731
            mesh, batch_partition_spec(mesh, np.asarray(a).shape[1]),
            np.asarray(a))
    # multi-host hygiene (the reference gates on rank 0, `train.py:149-154`):
    # exactly one process prints and writes metrics.  Checkpoint SAVES stay
    # un-gated on purpose — orbax saving of (possibly sharded) global arrays
    # is a COLLECTIVE: every process must call save(); orbax coordinates the
    # writes into one checkpoint directory (rank-gating it would deadlock).
    is_chief = jax.process_index() == 0
    metrics = None
    if train_cfg.with_tensorboard and is_chief:
        import os
        import time
        mdir = ckpt_dir or "."
        os.makedirs(mdir, exist_ok=True)
        metrics = open(os.path.join(mdir, "metrics.jsonl"), "a", buffering=1)
        t_start = time.time()
    dev_batches = _device_prefetch(batches, first=(mel0, audio0),
                                   shard_fn=shard_fn)
    for it in range(start_iter, num_iters):
        mel_d, audio_d = next(dev_batches)
        state, loss = step_fn(state, mel_d, audio_d)
        losses.append(loss)
        if it % log_every == 0:
            # the float() fetch happens only at log cadence (a per-iteration
            # fetch would synchronize the async dispatch pipeline)
            loss_f = float(loss)
            if is_chief:
                print(f"{it}:\t{loss_f:.9f}", flush=True)
            if metrics is not None:
                import json
                import time
                metrics.write(json.dumps(
                    {"iteration": it, "loss": loss_f,
                     "elapsed_s": round(time.time() - t_start, 3)}) + "\n")
        if ckpt_dir and (it + 1) % train_cfg.iters_per_checkpoint == 0:
            save_checkpoint(ckpt_dir, state, it + 1)
    if metrics is not None:
        metrics.close()
    return state, [float(l) for l in losses]


def _device_prefetch(batches: Iterator, first=None, depth: int = 2,
                     shard_fn=None):
    """Background-thread host->device staging of upcoming batches — the
    analog of the reference's `DataLoader(num_workers=1, pin_memory=True)`
    (`train.py:109-117`): featurization AND the device transfer of batch
    i+1/i+2 overlap step i's compute instead of serializing with it (the
    transfer is the dominant per-iteration cost on a tunneled TPU).
    `shard_fn` stages each array directly into its final (sharded) layout so
    sharded training doesn't pay a chip0->all-chips reshard per step.
    Worker exceptions are re-raised in the consumer."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def stage(batch):
        return tuple(shard_fn(a) if shard_fn else jnp.asarray(a)
                     for a in batch)

    def worker():
        try:
            if first is not None and not put(stage(first)):
                return
            while not stop.is_set():
                batch = next(batches)
                if not put(stage(batch)):
                    return
        except StopIteration:
            pass
        except BaseException as e:  # surface in the consumer, don't hang it
            put(e)
            return
        put(None)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
