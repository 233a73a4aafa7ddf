"""Training harness: tracking + pileup trainers.

Rebuilds reference `src/tracking_trainer.py` / `src/pileup_trainer.py` as a
single harness: epoch loop over train/valid/test, per-epoch metrics,
best-by-valid checkpointing, LR schedules (step / cosine / plateau), and a
jitted data-parallel train step over the device mesh.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datasets import SplitDataset, get_dataset
from ..models.transformer import HeptTransformer
from ..parallel.dp import (
    make_dp_train_step,
    make_single_device_train_step,
    shard_batch,
)
from ..parallel.mesh import make_mesh
from ..train.config import ExperimentConfig
from ..train.losses import focal_loss, infonce_loss
from ..train.metrics import (
    acc_and_pr_at_k,
    binary_classification_metrics,
    point_filter,
    tracking_metrics_batch,
)
from ..train.optim import PlateauState, apply_plateau_scale, make_lr_schedule, make_optimizer
from ..train.state import CheckpointManager, TrainState
from ..utils.logging import ScalarLogger, log


def make_loss_fn(cfg: ExperimentConfig):
    """Loss factory keyed by loss_name (reference src/utils/utils.py:40-48)."""
    if cfg.task == "tracking":
        tau = cfg.loss_kwargs.get("tau", 0.05)
        dist = cfg.loss_kwargs.get("dist_metric", "l2_rbf")
        use_triplet = cfg.loss_name == "triplet"

        def loss_fn(outputs, batch):
            def per_event(out, pairs, pmask, cid, recons, pts,
                          rev=None, weight=None, neg=None):
                if use_triplet:
                    from ..train.losses import triplet_margin_loss

                    return triplet_margin_loss(
                        out, pairs, pmask, cid, recons, pts,
                        margin=cfg.loss_kwargs.get("margin", 0.5),
                    )
                return infonce_loss(
                    out, pairs, pmask, cid, recons, pts, tau=tau,
                    dist_metric=dist, windowed_pairs=cfg.windowed_pairs,
                    pair_rev=rev, pair_weight=weight, pair_neg=neg,
                )

            args = [outputs, batch["pairs"], batch["pair_mask"],
                    batch["cluster_ids"], batch["recons"], batch["pts"]]
            if cfg.windowed_pairs and not use_triplet:
                # pack-time extras (reverse-pair index + cluster weights)
                # when present; unrolled per-event losses: vmapping the
                # Pallas windowed pair ops would add a batched grid dim
                if "pair_rev" in batch:
                    args += [batch["pair_rev"], batch["pair_weight"],
                             batch["pair_neg"]]
                b = outputs.shape[0]
                losses = [per_event(*(a[i] for a in args)) for i in range(b)]
                return sum(losses) / len(losses)
            return jnp.mean(jax.vmap(per_event)(*args))

        return loss_fn

    if cfg.task == "pileup":
        alpha = cfg.loss_kwargs.get("alpha", 0.25)
        gamma = cfg.loss_kwargs.get("gamma", 2.0)

        def loss_fn(outputs, batch):
            mask = batch["is_neu"] & batch["valid"]
            return focal_loss(
                outputs[..., 0], batch["y"], mask, alpha=alpha, gamma=gamma
            )

        return loss_fn
    raise NotImplementedError(cfg.task)


def build_model(cfg: ExperimentConfig, in_dim: int, coords_dim: int):
    """Model factory keyed by reference model_name strings
    (reference src/utils/get_model.py:6-28): trans_<attn> / gnn_<conv>."""
    if cfg.model_name.startswith("gnn_"):
        from ..models.gnns import GNNStack
        from ..models.transformer import TransformerConfig

        conv = cfg.model_name.split("_", 1)[1]
        mk = dict(cfg.model_kwargs)
        tc = TransformerConfig(
            in_dim=in_dim,
            coords_dim=coords_dim,
            task=cfg.task,
            h_dim=mk.get("hidden_dim", 64),
            n_layers=mk.get("num_layers", 4),
            out_dim=mk.get("out_dim"),
            knn_k=mk.get("graph_k", 16),
        )
        return GNNStack(tc, conv_type=conv, k=mk.get("k", 8),
                        knn_dim=mk.get("knn_dim", 4)), tc
    mc = cfg.model_config(in_dim, coords_dim)
    return HeptTransformer(mc), mc


def make_model_apply(model, model_cfg=None, batch_mode: str = "vmap"):
    is_gnn = model.__class__.__name__ == "GNNStack"
    if batch_mode == "flat" and not is_gnn             and getattr(model.cfg, "attn_type", None) == "hept":
        from ..models.transformer import make_flat_batched_apply

        flat = make_flat_batched_apply(model)

        def model_apply_flat(variables, batch, rngs=None):
            return flat(
                variables, batch["x"], batch["coords"], batch["valid"],
                deterministic=rngs is None, rngs=rngs,
            )

        return model_apply_flat

    def gnn_graph(coords, valid):
        """in-jit kNN graph + RBF edge weights on eta/phi (the datasets'
        knn_graph(k=60) + compute_edge_weight, utils.py:17-23)."""
        from ..ops.knn import knn_brute_force

        n = coords.shape[0]
        k = model_cfg.knn_k if model_cfg is not None else 16
        d2, idx = knn_brute_force(coords[:, :2], coords[:, :2], k + 1, valid=valid)
        dst = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
        src = idx[:, 1:].reshape(-1).astype(jnp.int32)
        edges = jnp.stack([src, dst])
        edge_mask = valid[src] & valid[dst]
        ew = -d2[:, 1:].reshape(-1, 1)
        return edges, edge_mask, ew

    def model_apply(variables, batch, rngs=None):
        def one(x, coords, valid, rng):
            if rng is not None:
                rd, rr = jax.random.split(rng)
                r = {"dropout": rd, "rotations": rr}
            else:
                r = None
            det = rng is None
            if is_gnn:
                edges, edge_mask, ew = gnn_graph(coords, valid)
                return model.apply(
                    variables, x, coords, valid, edges=edges,
                    edge_mask=edge_mask, edge_weight=ew,
                    deterministic=det, rngs=r,
                )
            return model.apply(variables, x, coords, valid, deterministic=det, rngs=r)

        if rngs is not None:
            keys = jax.random.split(rngs["dropout"], batch["x"].shape[0])
            return jax.vmap(one, in_axes=(0, 0, 0, 0))(
                batch["x"], batch["coords"], batch["valid"], keys
            )
        return jax.vmap(lambda x, c, v: one(x, c, v, None))(
            batch["x"], batch["coords"], batch["valid"]
        )

    return model_apply


def make_eval_step(cfg, model_apply, chunk: int = 1):
    """Jitted eval step: forward + loss + (tracking) retrieval metrics.

    chunk == 1: one device call per eval batch (host reads still deferred to
    the end of the split). chunk > 1: the returned step consumes `chunk`
    STACKED batches and lax.map's the body over them — one device call (and
    one tunnel dispatch) per chunk, so eval wall time stays flat as the
    dataset grows (VERDICT r3 #9)."""
    loss_fn = make_loss_fn(cfg)
    split_programs = bool(getattr(cfg, "eval_split_programs", False))

    if cfg.task == "tracking":

        def tail(out, jb):
            loss = loss_fn(out, jb)
            tm = tracking_metrics_batch(
                out, jb["cluster_ids"], jb["recons"], jb["pts"], jb["valid"]
            )  # (B, 3 thresholds, 3 metrics)
            return loss, tm

    else:

        def tail(out, jb):
            return loss_fn(out, jb), out

    def body(variables, jb):
        return tail(model_apply(variables, jb), jb)

    steps: dict = {}

    def get_step(g: int):
        """Jitted step for a group of g batches. chunk == 1: the plain
        per-batch body (callers pass one unstacked batch). chunk > 1: a
        lax.map over a size-g stack — compiled once per distinct size (full
        chunks plus at most one remainder size per split; no padding, so
        small splits never pay repeated-batch eval compute).
        eval_split_programs: the forward and the loss+metric tail compile
        as two separate programs (corruption-class mitigation; see
        config.py)."""
        if g not in steps:
            if chunk == 1:
                if split_programs:
                    f_fwd = jax.jit(model_apply)
                    f_tail = jax.jit(tail)
                    steps[g] = lambda variables, jb: f_tail(
                        f_fwd(variables, jb), jb)
                else:
                    steps[g] = jax.jit(body)
            elif split_programs:
                f_fwd = jax.jit(
                    lambda variables, stacked: jax.lax.map(
                        lambda jb: model_apply(variables, jb), stacked
                    )
                )
                f_tail = jax.jit(
                    lambda outs, stacked: jax.lax.map(
                        lambda p: tail(p[0], p[1]), (outs, stacked)
                    )
                )
                steps[g] = lambda variables, stacked: f_tail(
                    f_fwd(variables, stacked), stacked)
            else:
                steps[g] = jax.jit(
                    lambda variables, stacked: jax.lax.map(
                        lambda jb: body(variables, jb), stacked
                    )
                )
        return steps[g]

    get_step.chunk = chunk
    return get_step


def evaluate(cfg, model_apply, variables, dataset: SplitDataset, split: str,
             block_size: int, n_max: int, e_max: int, eval_apply=None,
             eval_step=None):
    """Task metrics over a split (host-side aggregation, eval only).

    Pass a pre-built `eval_step` (make_eval_step) to avoid re-tracing every
    epoch. `eval_apply` is the legacy forward-only hook, still accepted.
    """
    del eval_apply  # superseded by the fused eval_step
    if eval_step is None:
        eval_step = make_eval_step(
            cfg, model_apply, chunk=max(1, int(getattr(cfg, "eval_chunk", 1)))
        )
    chunk = getattr(eval_step, "chunk", 1)

    def chunked(batches):
        """Yield (device_result, n_real, group_batches) per eval_step call:
        groups of up to `chunk` batches stacked on a new leading axis and
        lax.map'ed in one device call (the remainder group runs at its own
        exact size — no padding), or single batches when chunk == 1."""
        grp = []
        for batch in batches:
            grp.append(batch)
            if len(grp) == chunk:
                yield _eval_call(eval_step, variables, grp), chunk, grp
                grp = []
        if grp:
            yield _eval_call(eval_step, variables, grp), len(grp), grp

    kw = dict(n_max=n_max)
    if cfg.task == "tracking":
        kw["e_max"] = e_max
        kw["window_pairs"] = 128 if cfg.windowed_pairs else 0
    # Eval batches are deterministic (no shuffling/augmentation), but the
    # windowed pair packing is real host work (~seconds per 60k event) paid
    # every epoch — cache the packed split on the dataset (train batches
    # are NOT cached: augmentation re-packs them each epoch).
    ck = (split, cfg.batch_size, block_size, n_max, e_max,
          cfg.task == "tracking" and cfg.windowed_pairs)
    cache = getattr(dataset, "_eval_batch_cache", None)
    if cache is None:
        cache = {}
        try:
            dataset._eval_batch_cache = cache
        except Exception:
            pass
    if ck not in cache:
        cache[ck] = list(
            dataset.iter_batches(split, cfg.batch_size, block_size, **kw)
        )
    batches = cache[ck]
    if cfg.task == "tracking":
        losses, tms = [], []
        for (loss, tm), n_real, _ in chunked(batches):
            if chunk > 1:
                loss, tm = loss[:n_real], tm[:n_real]
                tm = tm.reshape(-1, *tm.shape[2:])
            losses.append(loss)  # device arrays — one host sync at the end
            tms.append(tm)
        losses = np.concatenate(
            [np.atleast_1d(np.asarray(l)) for l in jax.device_get(losses)]
        ).tolist() if losses else []
        res = {"loss": float(np.mean(losses)) if losses else float("nan")}
        if tms:
            tm = np.concatenate(jax.device_get(tms), axis=0)  # (ΣB, 3, 3)
            for ti, thres in enumerate((0.0, 0.5, 0.9)):
                res[f"accuracy@{thres:g}"] = float(tm[:, ti, 0].mean())
                res[f"precision@{thres:g}"] = float(tm[:, ti, 1].mean())
                res[f"recall@{thres:g}"] = float(tm[:, ti, 2].mean())
        else:
            for thres in (0.0, 0.5, 0.9):
                res[f"accuracy@{thres:g}"] = float("nan")
                res[f"precision@{thres:g}"] = float("nan")
                res[f"recall@{thres:g}"] = float("nan")
        return res

    # pileup: per-batch metrics averaged across batches (reference parity —
    # pileup_trainer.py update_metrics feeds per-batch AP/ROC/F1 into
    # MeanMetric and reports the mean, not the micro-average). AP/ROC/F1 are
    # host-side (sort-based sklearn-style curves); device reads are deferred
    # to one sync at the end of the split.
    losses, outs, masks, ys = [], [], [], []
    for (loss, out), n_real, grp in chunked(batches):
        if chunk > 1:
            losses.extend(loss[:n_real])
            outs.extend(out[i, ..., 0] for i in range(n_real))
        else:
            losses.append(loss)
            outs.append(out[..., 0])
        for b in grp[:n_real]:
            masks.append(np.asarray(b["is_neu"]) & np.asarray(b["valid"]))
            ys.append(np.asarray(b["y"]))
    losses, outs = jax.device_get((losses, outs))
    per_batch = []
    for out, mask, y in zip(outs, masks, ys):
        mask = np.asarray(mask)
        p, t = np.asarray(out)[mask], np.asarray(y)[mask]
        if t.size and t.min() != t.max():  # degenerate batches carry no AUC
            per_batch.append(binary_classification_metrics(p, t))
    keys = per_batch[0].keys() if per_batch else ()
    res = {k: float(np.mean([m[k] for m in per_batch])) for k in keys}
    res["loss"] = float(np.mean([float(l) for l in losses])) if losses else float("nan")
    return res


def _eval_call(eval_step, variables, grp):
    """Dispatch one eval_step call: a single unstacked batch (chunk == 1)
    or a stacked size-len(grp) group for the lax.map'ed step."""
    step = eval_step(len(grp))
    if getattr(eval_step, "chunk", 1) == 1:
        return step(variables, jax.tree_util.tree_map(jnp.asarray, grp[0]))
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *grp)
    return step(variables, jax.tree_util.tree_map(jnp.asarray, stacked))


def run_one_seed(cfg: ExperimentConfig, dataset: Optional[SplitDataset] = None) -> dict:
    """Train one seed to completion; returns best test metrics
    (reference tracking_trainer.py:112-196 equivalent)."""
    rng = jax.random.PRNGKey(cfg.seed)
    if dataset is None:
        dataset = get_dataset(cfg.dataset_name, seed=cfg.seed, data_dir=cfg.data_dir) \
            if cfg.dataset_name.startswith(("tracking-", "pileup")) \
            else get_dataset(cfg.dataset_name, seed=cfg.seed)

    block_size = cfg.model_kwargs.get("block_size", 100)
    from ..data.batching import slab_friendly_n

    # bucket count rounded for full flat-slab kernels at any 128-multiple
    # block size (the big-bucket recall lever rides on this; ≤7 extra
    # buckets of replicate padding)
    n_max = slab_friendly_n(max(ev.n for s in ("train", "valid", "test")
                                for ev in getattr(dataset, s)), block_size)
    e_max = max(
        (ev.pairs.shape[1] for s in ("train", "valid", "test")
         for ev in getattr(dataset, s) if ev.pairs is not None),
        default=0,
    )
    if e_max and cfg.task == "tracking" and cfg.windowed_pairs:
        # the windowed layout symmetrizes + window-pads pairs at pack time;
        # size the static E from the PROCESSED lengths (undersizing silently
        # truncates window pads and drops the Pallas pair kernels) plus
        # augmentation + window-break headroom, rounded to whole windows.
        # `processed_pair_len` computes the exact lengths without building
        # the padded arrays, and the result is cached on the dataset so
        # multi-seed / resumed runs pay the O(dataset) pass once.
        from ..data.batching import processed_pair_len

        cache = getattr(dataset, "_sizing_cache", None)
        if cache is None:
            cache = {}
            try:
                dataset._sizing_cache = cache
            except Exception:
                pass
        ck = ("windowed_e_max", 128)
        if ck not in cache:
            cache[ck] = max(
                processed_pair_len(ev.pairs, ev.n, 128)
                for s in ("train", "valid", "test")
                for ev in getattr(dataset, s)
                if ev.pairs is not None
            )
        e_max = cache[ck]
        e_max += 2 * int(e_max * cfg.pair_aug_p / 2)
        e_max = _ceil(e_max + max(256, e_max // 16), 128)
    elif e_max and cfg.task == "tracking" and cfg.pair_aug_p > 0:
        # headroom for train-time random pair augmentation (process_data)
        e_max += 2 * int(e_max * cfg.pair_aug_p / 2)

    model, model_cfg = build_model(cfg, dataset.in_dim, dataset.coords_dim)
    model_apply = make_model_apply(model, model_cfg, batch_mode=cfg.batch_mode)

    # init on one event (through model_apply so GNN graphs are built too)
    ev0 = dataset.train[0]
    from ..data.batching import pack_events

    b0 = pack_events([ev0], block_size, n_max=n_max, e_max=e_max or None)
    rng, init_rng = jax.random.split(rng)
    jb0 = jax.tree_util.tree_map(jnp.asarray, b0)
    variables = _init_model(model, model_cfg, init_rng, jb0)

    steps_per_epoch = max(1, len(dataset.train) // cfg.batch_size)
    schedule = make_lr_schedule(
        cfg.lr_scheduler_name,
        cfg.optimizer_kwargs.get("lr", 1e-3),
        steps_per_epoch=steps_per_epoch,
        num_epochs=cfg.num_epochs,
        **{k: v for k, v in cfg.lr_scheduler_kwargs.items() if k in
           ("gamma", "step_size", "num_warmup_epochs", "eta_min_ratio")},
    )
    tx = make_optimizer(
        cfg.optimizer_name, schedule=schedule,
        weight_decay=cfg.optimizer_kwargs.get("weight_decay", 0.0),
        clip_norm=cfg.optimizer_kwargs.get("clip_norm", 0.0),
    )
    plateau = None
    if cfg.lr_scheduler_name == "impatient":
        plateau = PlateauState(
            factor=cfg.lr_scheduler_kwargs.get("factor", 0.5),
            patience=cfg.lr_scheduler_kwargs.get("patience", 20),
            mode=cfg.lr_scheduler_kwargs.get("mode", "min"),
        )

    from ..utils.flops import param_count

    n_params = param_count(variables["params"])
    log(f"model {cfg.model_name}: {n_params:,} params")
    if cfg.only_flops:
        from ..utils.flops import cost_analysis

        ca = cost_analysis(
            lambda v, b: model_apply(v, b),
            variables,
            jax.tree_util.tree_map(jnp.asarray, b0),
        )
        log(f"XLA cost analysis: flops={ca.get('flops')}, "
            f"bytes accessed={ca.get('bytes accessed')}")
        return {"params": n_params, **{k: v for k, v in ca.items() if v is not None}}

    rng, state_rng = jax.random.split(rng)
    state = TrainState.create(variables, tx, state_rng)

    n_dev = cfg.n_devices
    sh = max(1, int(cfg.shard_heads)) * max(1, int(cfg.shard_hashes))
    if n_dev is None:
        # largest device count that evenly divides the event batch (times the
        # model-shard factor when TP is on)
        avail = len(jax.devices())
        n_dev = sh * max(
            d for d in range(1, avail // sh + 1) if cfg.batch_size % d == 0
        )
    loss_fn = make_loss_fn(cfg)
    if sh > 1:
        # DP x hash-TP x head-TP on a ("data","hashes","heads") mesh
        # (parallel/tp.py).
        from ..parallel.tp import make_tp_train_step, shard_batch_2d
        from ..models import HeptTransformer

        heads = max(1, int(cfg.shard_heads))
        hashes = max(1, int(cfg.shard_hashes))
        assert n_dev % sh == 0, f"n_devices {n_dev} not divisible by model shards {sh}"
        assert cfg.batch_mode == "vmap", "shard_heads/hashes require batch_mode='vmap'"
        mesh = make_mesh(
            n_dev, ("data", "hashes", "heads"), (n_dev // sh, hashes, heads)
        )
        train_step = make_tp_train_step(
            HeptTransformer, model_cfg, loss_fn, tx, mesh, variables,
            head_axis="heads", hash_axis="hashes",
        )
        transfer_fn = lambda b: shard_batch_2d(b, mesh)  # noqa: E731
    elif n_dev == 1:
        # Plain jit on one device: the mesh/NamedSharding wrapper buys
        # nothing and some remote backends fail to AOT-compile the sharded
        # module (axon remote_compile HTTP 500 on single-chip meshes).
        mesh = None
        train_step = make_single_device_train_step(model_apply, loss_fn, tx)
        transfer_fn = lambda b: jax.tree_util.tree_map(jnp.asarray, b)  # noqa: E731
    else:
        mesh = make_mesh(n_dev)
        train_step = make_dp_train_step(model_apply, loss_fn, tx, mesh, donate=False)
        transfer_fn = lambda b: shard_batch(b, mesh)  # noqa: E731

    # Time-stamped run dirs, like the reference's time+rand_model_seed_note
    # naming (tracking_trainer.py:121-125). A reused dir is actively harmful:
    # orbax retention keeps the HIGHEST step numbers, so a fresh run whose
    # steps restart at 0 gets its checkpoints deleted in favour of a previous
    # run's (observed cross-contamination between 60k demo arms). `resume`
    # must point at an existing run dir via cfg.resume instead.
    stamp = time.strftime("%m%d-%H%M%S")
    run_dir = Path(cfg.log_dir) / (
        f"{stamp}_{cfg.task}_{cfg.model_name}_{cfg.seed}_{cfg.note}"
    )
    logger = ScalarLogger(run_dir)
    ckpt = CheckpointManager(run_dir / "ckpt")

    if cfg.resume:
        resume_ckpt = CheckpointManager(Path(cfg.resume) / "ckpt")
        state = resume_ckpt.restore(state)
        log(f"resumed from step {int(state.step)}")

    eval_step = make_eval_step(
        cfg, model_apply, chunk=max(1, int(getattr(cfg, "eval_chunk", 1)))
    )
    best = -np.inf if cfg.mode == "max" else np.inf
    best_test: dict = {}
    sign = 1.0 if cfg.mode == "max" else -1.0
    data_rng = np.random.default_rng(cfg.seed)

    if cfg.only_eval:
        test = evaluate(cfg, model_apply, state.variables, dataset, "test",
                        block_size, n_max, e_max, eval_step=eval_step)
        logger.close()
        return test

    from ..data.prefetch import prefetch

    for epoch in range(cfg.num_epochs):
        t0 = time.time()
        epoch_losses = []
        batches = dataset.iter_batches(
            "train", cfg.batch_size, block_size, n_max=n_max, e_max=e_max or None,
            shuffle_rng=data_rng,
            aug_pair_p=cfg.pair_aug_p if cfg.task == "tracking" else 0.0,
            window_pairs=128 if (cfg.task == "tracking" and cfg.windowed_pairs) else 0,
        )
        for sb in prefetch(batches, transfer=transfer_fn):
            state, metrics = train_step(state, sb)
            # keep device scalars; ONE host sync per epoch below. A float()
            # here would cost a host round trip per step (visible through
            # the remote TPU tunnel at ~100 ms-step scales).
            epoch_losses.append(metrics["loss"])

        train_loss = float(np.mean([float(l) for l in jax.device_get(epoch_losses)]))
        # Fence the epoch's (buffer-donating) train steps before dispatching
        # eval reads of the same params buffers. The loss device_get above
        # already orders execution in principle; this explicit await is
        # cheap insurance against stale/aliased reads through the async
        # remote-TPU tunnel (ROADMAP round 4: two demos' in-loop evals
        # scored ~0.12 while the same checkpoints score 0.94 post-hoc).
        jax.block_until_ready(state.params)
        valid = evaluate(cfg, model_apply, state.variables, dataset, "valid",
                        block_size, n_max, e_max, eval_step=eval_step)
        logger.write(epoch, {"loss": train_loss, "epoch_sec": time.time() - t0},
                     prefix="train/")
        logger.write(epoch, valid, prefix="valid/")

        if plateau is not None:
            metric_key = cfg.lr_scheduler_metric or "loss"
            metric_val = valid.get(metric_key, train_loss) if metric_key != "loss" else train_loss
            scale = plateau.update(metric_val)
            state = state.replace(
                opt_state=apply_plateau_scale(state.opt_state, scale)
            )

        score = valid.get(cfg.main_metric, valid.get("loss"))
        if np.isnan(score):
            score = -sign * np.inf
        if sign * score > sign * best:
            best = score
            test = evaluate(cfg, model_apply, state.variables, dataset, "test",
                            block_size, n_max, e_max, eval_step=eval_step)
            best_test = test
            logger.write(epoch, test, prefix="test/")
            ckpt.save(int(state.step), state, metrics={cfg.main_metric: float(score)})
        log(
            f"epoch {epoch}: train_loss={train_loss:.4f} "
            f"valid[{cfg.main_metric}]={score:.4f} best={best:.4f}"
            + (f" lr_scale={plateau.scale:g}" if plateau is not None else "")
        )

    ckpt.close()
    # Reference-flow parity + eval-corruption guard: restore the BEST
    # checkpoint fresh from disk and re-evaluate test (the reference trains,
    # reloads the best model, then tests — tracking_trainer.py end-of-run).
    # A mismatch with the in-loop best_test flags transient eval corruption
    # (ROADMAP round 4: two r12cv2r demos scored ~0.12 in-loop while their
    # saved checkpoints score 0.94 post-hoc); the re-eval wins.
    if best_test and cfg.num_epochs > 0:
        try:
            restored = CheckpointManager(run_dir / "ckpt").restore(state)
            final = evaluate(cfg, model_apply, restored.variables, dataset,
                             "test", block_size, n_max, e_max,
                             eval_step=eval_step)
            key = cfg.main_metric
            if key in final and key in best_test and not np.isclose(
                final[key], best_test[key], rtol=0, atol=1e-6
            ):
                log(
                    f"WARNING: in-loop best test {key}={best_test[key]:.4f}"
                    f" != restored-ckpt re-eval {final[key]:.4f} — trusting"
                    " the re-eval (in-loop eval corruption?)"
                )
            best_test = final
            # Shape cross-check (opt-in): the same checkpoint at perturbed
            # static shapes must score the same — padding is inert. Catches
            # deterministic shape-specific wrong-results in the compiled
            # eval program (ROADMAP round 4 "RE-DIAGNOSED") that the
            # same-shapes re-eval above cannot see.
            if getattr(cfg, "eval_shape_check", False) and key in final:
                try:
                    alt = evaluate(
                        cfg, model_apply, restored.variables, dataset, "test",
                        block_size, n_max + block_size,
                        (e_max + 128) if e_max else e_max,
                    )
                    tol = getattr(cfg, "eval_shape_check_tol", 0.02)
                    a = alt.get(key, float("nan"))
                    # NaN/missing must FAIL (abs(nan-x) > tol is False):
                    # a non-finite perturbed-shape metric is exactly the
                    # corruption class this check exists to catch
                    ok = np.isfinite(a) and abs(a - final[key]) <= tol
                    if ok:
                        log(f"shape cross-check ok ({key}: "
                            f"{final[key]:.4f} vs {a:.4f})")
                    else:
                        log(
                            f"WARNING: shape cross-check failed — test "
                            f"{key}={final[key]:.4f} at (n_max={n_max}, "
                            f"e_max={e_max}) vs {a:.4f} at perturbed shapes;"
                            " one of the compiled eval programs is wrong"
                        )
                except Exception as e:  # noqa: BLE001 — guard of a guard
                    log(f"WARNING: shape cross-check itself failed to run "
                        f"({type(e).__name__}: {e}) — shape sensitivity "
                        "unverified for this run")
        except Exception as e:  # noqa: BLE001 — the guard must never kill a run
            log(f"final re-eval skipped ({type(e).__name__}: {e})")
    logger.close()
    return best_test


def _init_model(model, model_cfg, rng, batch):
    x, coords, valid = batch["x"][0], batch["coords"][0], batch["valid"][0]
    if model.__class__.__name__ == "GNNStack":
        from ..ops.knn import knn_brute_force

        n = coords.shape[0]
        k = model_cfg.knn_k
        d2, idx = knn_brute_force(coords[:, :2], coords[:, :2], k + 1, valid=valid)
        dst = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
        src = idx[:, 1:].reshape(-1).astype(jnp.int32)
        return model.init(
            rng, x, coords, valid,
            edges=jnp.stack([src, dst]),
            edge_mask=valid[src] & valid[dst],
            edge_weight=-d2[:, 1:].reshape(-1, 1),
        )
    return model.init(rng, x, coords, valid)


def _ceil(n, m):
    return ((n + m - 1) // m) * m
