"""Training engine (SURVEY C13; reference counterpart ``trainer.py`` [K]).

Epoch loop over windowed pianoroll batches; optax Adam/SGD with global-norm
clipping; CD-k updates for RBM decoders / exact-gradient updates for NADE
(both via ``multinn.loss`` — the distinction lives in the decoder);
optional greedy layer-wise DBN-encoder pre-training; per-epoch validation,
early stopping, best/last orbax checkpoints, JSONL+console metrics.

TPU-first: ONE jitted (or shard_map'ped) train-step program; the host loop
only feeds uint8 batches and reads metric scalars. Under a mesh (SURVEY §5.8)
the step is wrapped in shard_map with the batch sharded over ``data`` and
gradients pmean-reduced across it; RNG keys are folded with the data-axis
index so Gibbs noise decorrelates across shards while staying reproducible.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from multinn_tpu.data.datasets import Dataset
from multinn_tpu.models import multinn
from multinn_tpu.models import encoders as enc_mod
from multinn_tpu.parallel import mesh as mesh_mod
from multinn_tpu.training.checkpoint import Checkpointer
from multinn_tpu.utils import profiling
from multinn_tpu.utils.logging import (MetricsLogger, format_metrics,
                                       setup_logger)


class FaultInjected(RuntimeError):
    """Raised by --train.fault_inject_step (SURVEY §5.3 resume-path CI)."""


def make_schedule(cfg, steps_per_epoch: int = 0):
    """LR schedule from TrainConfig: optional linear warmup into constant or
    cosine decay (to lr_min over decay_steps; 0 = epochs × steps_per_epoch).
    Returns a float (constant, no warmup) or an optax schedule — the
    schedule is part of the jitted update, so LR changes never recompile."""
    if cfg.lr_schedule == "constant":
        if not cfg.warmup_steps:
            return cfg.lr
        return optax.schedules.linear_schedule(0.0, cfg.lr, cfg.warmup_steps)
    if cfg.lr_schedule == "cosine":
        decay = cfg.decay_steps or max(cfg.epochs * max(steps_per_epoch, 1),
                                       1)
        # optax's decay_steps INCLUDES the warmup span; a warmup longer than
        # the run would make the cosine segment negative (crash) — clamp
        decay = max(decay, cfg.warmup_steps + 1)
        return optax.schedules.warmup_cosine_decay_schedule(
            init_value=0.0 if cfg.warmup_steps else cfg.lr,
            peak_value=cfg.lr, warmup_steps=cfg.warmup_steps,
            decay_steps=decay, end_value=cfg.lr_min)
    raise ValueError(f"unknown lr_schedule '{cfg.lr_schedule}'")


def make_optimizer(cfg, steps_per_epoch: int = 0, freeze_encoder: bool = False
                   ) -> optax.GradientTransformation:
    chain = []
    if cfg.grad_clip and cfg.grad_clip > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip))
    lr = make_schedule(cfg, steps_per_epoch)
    if cfg.optimizer == "adam":
        if cfg.weight_decay:
            chain.append(optax.adamw(lr, weight_decay=cfg.weight_decay))
        else:
            chain.append(optax.adam(lr))
    elif cfg.optimizer == "sgd":
        if cfg.weight_decay:
            # classic L2 (decay folded into the momentum update) — sgd has
            # no decoupled variant; silently dropping the knob would make a
            # weight-decay sweep under sgd a no-op
            chain.append(optax.add_decayed_weights(cfg.weight_decay))
        chain.append(optax.sgd(lr, momentum=0.9))
    else:
        raise ValueError(f"unknown optimizer '{cfg.optimizer}'")
    opt = optax.chain(*chain)
    if freeze_encoder:
        # DBN encoders are frozen during joint training (decoder-facing
        # features are stop-gradient — models/encoders.features). Gradients
        # are already exactly zero, but GRADIENT-INDEPENDENT update terms
        # would still move the weights — adamw's decoupled weight decay
        # shrinks them toward 0, driving every latent toward σ(0)=0.5 and
        # silently re-degrading the latent channel (round-4 review,
        # verified: zero grad, 6e-6/step update). multi_transform +
        # set_to_zero makes frozen mean FROZEN unconditionally (optax.masked
        # would pass a masked subtree's incoming updates through RAW — a
        # future encoder-touching loss term would silently gradient-ascend
        # the "frozen" weights).
        opt = optax.multi_transform(
            {"train": opt, "freeze": optax.set_to_zero()},
            lambda params: params.replace(
                encoder=jax.tree.map(lambda _: "freeze", params.encoder),
                decoder=jax.tree.map(lambda _: "train", params.decoder)))
    return opt


class Trainer:
    """Public trainer API (B:5 surface: model/trainer/generator share the
    checkpoint artifact — see training/checkpoint.py)."""

    def __init__(self, cfg, dataset: Optional[Dataset] = None,
                 params: Optional[multinn.MultINNParams] = None):
        self.cfg = cfg
        self.log = setup_logger(run_dir=cfg.train.run_dir)
        self.dataset = dataset if dataset is not None else Dataset(cfg.data)
        self.mesh = mesh_mod.make_mesh(cfg.mesh)

        self._gspmd = self.mesh is not None and cfg.mesh.style == "gspmd"
        self._seqpipe = self.mesh is not None and cfg.mesh.style == "seqpipe"
        self.track_sharded = self._gspmd and cfg.mesh.track > 1
        # explicit-collective styles: shard_map (DP) and seqpipe (DP × SP).
        # _explicit_axes are the mesh axes per-shard code pmean/psums over;
        # _batch_spec shards (B, T, ...) batches (and (B, T) masks) on them.
        if self.mesh is not None and not self._gspmd:
            if self._seqpipe:
                self._explicit_axes = (mesh_mod.DATA_AXIS, mesh_mod.SEQ_AXIS)
            else:
                self._explicit_axes = (mesh_mod.DATA_AXIS,)
            self._batch_spec = P(*self._explicit_axes)
            self._stacked_spec = P(None, *self._explicit_axes)
        else:
            self._explicit_axes = None
            self._batch_spec = None
            self._stacked_spec = None

        self.rng = jax.random.PRNGKey(cfg.train.seed)
        self.rng, init_key = jax.random.split(self.rng)
        self.params = (params if params is not None
                       else multinn.init(init_key, cfg.model))
        if self._gspmd:
            self.params = mesh_mod.put_multinn_sharded(
                self.params, self.mesh, self.track_sharded)
        elif self.mesh is not None:
            self.params = mesh_mod.put_replicated(self.params, self.mesh)
        self._imgsum_gen = None            # lazy TB image-summary program
        self._hf = cfg.train.optimizer == "hf"
        if self._hf:
            # Hessian-free truncated Newton (training/hf.py): second-order
            # macro-steps; needs a differentiable exact objective (NADE).
            # Composes with every mesh style: GSPMD runs the global-view
            # program; shard_map/seqpipe bodies pass _explicit_axes into
            # hf_step, whose pmean'd loss/grad/GGN-matvecs keep the CG
            # state replicated (one global system, not per-shard ones).
            from multinn_tpu.training import hf as hf_mod
            if cfg.model.decoder_type != "rnn-nade":
                raise ValueError("optimizer='hf' requires an rnn-nade "
                                 "decoder (CD has no objective to "
                                 "second-order optimize)")
            self.optimizer = None
            self.opt_state = hf_mod.init_state(self.params,
                                               cfg.train.hf_lambda0)
        else:
            self.optimizer = make_optimizer(
                cfg.train, steps_per_epoch=self.dataset.n_batches("train"),
                freeze_encoder=bool(cfg.model.encoder_hidden))
            # init AFTER placement: optax state inherits param shardings
            self.opt_state = self.optimizer.init(self.params)

        self.step = 0
        self.epoch = 0
        self.epoch_step0 = 0   # global step at the START of the current
        # epoch: step - epoch_step0 = batches already consumed this epoch
        # (the within-epoch data cursor — SURVEY §5.4 data_epoch_state)
        self.best_valid = float("inf")
        self._bad_epochs = 0
        self._epoch_final_step = -1

        self.metrics_log = MetricsLogger(cfg.train.run_dir)
        self.ckpt = Checkpointer(os.path.join(cfg.train.run_dir, "ckpt"),
                                 keep_last=cfg.train.keep_last,
                                 keep_best=cfg.train.keep_best)
        # hot path skips monitoring extras; the detailed step runs only on
        # logging steps (both warm the same compile-service session)
        self._train_step = self._build_train_step(detailed=False)
        self._train_step_detailed = self._build_train_step(detailed=True)
        self._train_multi = (self._build_multi_step()
                             if cfg.train.steps_per_call > 1 else None)
        self._eval_step = self._build_eval_step()

    # ------------------------------------------------------------------
    # step builders
    # ------------------------------------------------------------------

    def _loss_fn(self, params, batch_u8, key, detailed=True):
        x = batch_u8.astype(jnp.float32)
        return multinn.loss(params, key, x, detailed=detailed,
                            seq=self._seq_spec(x))

    def _seq_spec(self, x_local):
        """SeqSpec for the seqpipe style, built at TRACE time from the
        device-local shapes (so padded tail batches get a valid pipeline
        depth automatically); None for all other styles."""
        if not self._seqpipe:
            return None
        from multinn_tpu.parallel import seqpipe
        return seqpipe.SeqSpec(
            axis=mesh_mod.SEQ_AXIS, n_seq=self.cfg.mesh.seq,
            microbatches=seqpipe.auto_microbatches(
                x_local.shape[0], self.cfg.mesh.seq,
                self.cfg.mesh.seq_microbatches))

    def _fold_shard_key(self, key):
        """Decorrelate per-shard RNG streams (Gibbs noise) reproducibly."""
        for ax in self._explicit_axes:
            key = jax.random.fold_in(key, jax.lax.axis_index(ax))
        return key

    def _sampler_ctx(self, manual: Optional[bool] = None):
        """Trace-time contexts entered INSIDE every jitted step body (so any
        caller that traces a step — tests, __graft_entry__, future code — is
        covered regardless of call site; both contexts resolve at trace
        time):

        * sampler impl: on a multi-device GSPMD mesh the Gibbs/NADE
          dispatches must pick the XLA formulations (a Mosaic custom call
          cannot be partitioned by the SPMD pass — one rule shared with
          Generator: ops.sampling). shard_map/seqpipe bodies are per-shard
          (manual-mode) programs where Pallas custom calls are legal, so
          they keep the kernels (partitionable_ctx(manual=...)).
          ``manual`` defaults to the mesh STYLE's step programs; pass
          manual=False from paths that trace a plain GLOBAL-VIEW jit even
          under the explicit styles (encoder pre-training, image-summary
          generation) — those programs span the mesh like GSPMD ones and
          must force the XLA samplers too.
        * matmul precision: MultINNConfig.matmul_dtype routes the hot-path
          matmul feeds (ops/precision.py)."""
        import contextlib
        from multinn_tpu.ops import precision, sampling
        if manual is None:
            manual = self._explicit_axes is not None
        stack = contextlib.ExitStack()
        stack.enter_context(sampling.partitionable_ctx(
            self.mesh, manual=manual))
        stack.enter_context(precision.matmul_precision(
            self.cfg.model.matmul_dtype))
        return stack

    def _hf_step_fn(self):
        """HF macro-step with the trainer's step contract
        (params, opt_state, batch, key) -> (params, opt_state, metrics)."""
        from multinn_tpu.training import hf as hf_mod
        cg_iters = self.cfg.train.hf_cg_iters

        def step_fn(params, opt_state, batch, key):
            with self._sampler_ctx(), profiling.annotate("train_step"):
                x = batch.astype(jnp.float32)
                return hf_mod.hf_step(params, opt_state, x, key,
                                      seq=self._seq_spec(x),
                                      cg_iters=cg_iters,
                                      axes=self._explicit_axes)

        return step_fn

    def _build_train_step(self, detailed: bool = True):
        opt = self.optimizer
        axes = self._explicit_axes

        if self._hf:
            # detailed/hot distinction doesn't apply: every HF macro-step
            # reports its own diagnostics (rho/lambda/q/accept) — build the
            # jitted step once and share it between both trainer slots
            if not hasattr(self, "_hf_jitted_step"):
                hf_body = self._hf_step_fn()
                if axes is not None:
                    # explicit-collective styles: per-shard body, batch
                    # sharded on the mesh axes; hf_step's internal pmeans
                    # keep params/CG state replicated (out_specs P())
                    hf_fn = jax.shard_map(
                        lambda p, s, b, k: hf_body(
                            p, s, b, self._fold_shard_key(k)),
                        mesh=self.mesh,
                        in_specs=(P(), P(), self._batch_spec, P()),
                        out_specs=(P(), P(), P()),
                        check_vma=False)
                else:
                    hf_fn = hf_body
                self._hf_jitted_step = jax.jit(hf_fn, donate_argnums=(0, 1))
            return self._hf_jitted_step

        def step_fn(params, opt_state, batch, key):
            with self._sampler_ctx(), profiling.annotate("train_step"):
                (loss, metrics), grads = jax.value_and_grad(
                    lambda p, b, k: self._loss_fn(p, b, k, detailed),
                    has_aux=True)(params, batch, key)
                if axes is not None:
                    grads = jax.lax.pmean(grads, axes)
                    metrics = jax.lax.pmean(metrics, axes)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                metrics["grad_norm"] = optax.global_norm(grads)
                return params, opt_state, metrics

        if axes is None:
            # GSPMD: global-view program; argument shardings (params/batch
            # placed in __init__/_put_batch) drive XLA's SPMD partitioner,
            # which inserts the grad psums and the feedback all-gather.
            return jax.jit(step_fn, donate_argnums=(0, 1))

        def sharded(params, opt_state, batch, key):
            return step_fn(params, opt_state, batch,
                           self._fold_shard_key(key))

        mapped = jax.shard_map(
            sharded, mesh=self.mesh,
            in_specs=(P(), P(), self._batch_spec, P()),
            out_specs=(P(), P(), P()),
            check_vma=False)
        return jax.jit(mapped, donate_argnums=(0, 1))

    def _build_multi_step(self):
        """N optimizer steps fused into one device program: lax.scan over a
        stacked (N, B, T, K, D) super-batch. Removes the per-dispatch host
        overhead that dominates single-step execution on tunneled TPUs (the
        in-program step is ~20x faster than a per-step host loop here).

        The first N-1 steps run the loss-only hot path; the LAST step runs
        with detailed metrics + grad_norm, so the metrics ledger keeps full
        observability (f1/free-energy/grad-norm) under steps_per_call>1."""
        opt = self.optimizer
        axes = self._explicit_axes

        if self._hf:
            # HF macro-steps report their own diagnostics every step; the
            # detailed/hot distinction is a no-op
            hf_one = self._hf_step_fn()

            def one_step(p, s, batch, k, detailed):
                del detailed
                return hf_one(p, s, batch, k)
        else:
            def one_step(p, s, batch, k, detailed):
                (loss, metrics), grads = jax.value_and_grad(
                    lambda q, b, kk: self._loss_fn(q, b, kk, detailed),
                    has_aux=True)(p, batch, k)
                if axes is not None:
                    grads = jax.lax.pmean(grads, axes)
                    metrics = jax.lax.pmean(metrics, axes)
                updates, s = opt.update(grads, s, p)
                if detailed:
                    metrics["grad_norm"] = optax.global_norm(grads)
                return optax.apply_updates(p, updates), s, metrics

        def multi_fn(params, opt_state, batches, key):
            with self._sampler_ctx():
                n = batches.shape[0]
                keys = jax.random.split(key, n)

                def body(carry, inp):
                    p, s = carry
                    batch, k = inp
                    p, s, metrics = one_step(p, s, batch, k, False)
                    return (p, s), metrics["loss"]

                losses = jnp.zeros((0,))
                if n > 1:
                    (params, opt_state), losses = jax.lax.scan(
                        body, (params, opt_state), (batches[:-1], keys[:-1]))
                params, opt_state, metrics = one_step(
                    params, opt_state, batches[-1], keys[-1], True)
                metrics["loss_mean"] = (jnp.sum(losses)
                                        + metrics["loss"]) / n
                return params, opt_state, metrics

        if axes is None:
            return jax.jit(multi_fn, donate_argnums=(0, 1))

        def sharded(params, opt_state, batches, key):
            return multi_fn(params, opt_state, batches,
                            self._fold_shard_key(key))

        mapped = jax.shard_map(
            sharded, mesh=self.mesh,
            in_specs=(P(), P(), self._stacked_spec, P()),
            out_specs=(P(), P(), P()),
            check_vma=False)
        return jax.jit(mapped, donate_argnums=(0, 1))

    def _build_eval_step(self):
        """Returns FRAME-WEIGHTED metric sums plus ``n_frames`` (the weight),
        so the host can aggregate exactly across batches of different real-
        frame counts. Under shard_map the per-shard weighted sums are psum'd
        — shards with different masked-tail frame counts contribute exactly
        their frames (pmean of per-shard means would bias toward light
        shards)."""
        axes = self._explicit_axes

        def eval_fn(params, batch, key, mask):
            with self._sampler_ctx():
                k_loss, k_ll = jax.random.split(key)  # independent estimates
                x = batch.astype(jnp.float32)
                seq = self._seq_spec(x)
                loss, metrics = multinn.loss(params, k_loss, x,
                                             frame_mask=mask, seq=seq)
                ll = multinn.log_likelihood(params, k_ll, x, frame_mask=mask,
                                            seq=seq)
                n_frames = jnp.sum(mask.astype(jnp.float32))   # raw weight
                denom = jnp.maximum(n_frames, 1.0)
                metrics["ll_per_frame"] = (jnp.sum(ll)
                                           / (denom
                                              * self.cfg.model.n_tracks))
                weighted = {name: v * n_frames
                            for name, v in metrics.items()}
                weighted["n_frames"] = n_frames
                if axes is not None:
                    # per-shard frame-weighted sums psum'd over every sharded
                    # axis (data, and seq under seqpipe) — exact for metrics
                    # linear in frames even with unequal per-shard counts
                    weighted = jax.lax.psum(weighted, axes)
                return weighted

        if axes is None:
            return jax.jit(eval_fn)

        def sharded(params, batch, key, mask):
            return eval_fn(params, batch, self._fold_shard_key(key), mask)

        mapped = jax.shard_map(
            sharded, mesh=self.mesh,
            in_specs=(P(), self._batch_spec, P(), self._batch_spec),
            out_specs=P(), check_vma=False)
        return jax.jit(mapped)

    def _put_batch(self, batch_u8: np.ndarray) -> jax.Array:
        if self._gspmd and batch_u8.ndim == 2:        # (B, T) frame masks
            n_data = self.mesh.shape[mesh_mod.DATA_AXIS]
            spec = (mesh_mod.P(mesh_mod.DATA_AXIS)
                    if batch_u8.shape[0] % n_data == 0 else mesh_mod.P())
            return jax.device_put(batch_u8,
                                  mesh_mod.NamedSharding(self.mesh, spec))
        if self._gspmd:
            batch_axis = 1 if batch_u8.ndim == 5 else 0
            n_data = self.mesh.shape[mesh_mod.DATA_AXIS]
            if batch_u8.shape[batch_axis] % n_data:
                # short eval-tail batch: not shardable over data — place
                # replicated (GSPMD still computes correctly, just without
                # batch parallelism for this one small batch)
                return jax.device_put(batch_u8, mesh_mod.NamedSharding(
                    self.mesh, mesh_mod.P()))
            return jax.device_put(batch_u8, mesh_mod.batch_sharding(
                self.mesh, self.track_sharded,
                stacked=(batch_u8.ndim == 5)))
        if self.mesh is not None:
            # explicit styles (shard_map / seqpipe): lay batches out to match
            # the shard_map in_specs so no resharding happens at dispatch
            if batch_u8.ndim == 5:            # (N, B, ...) super-batch
                return jax.device_put(batch_u8, mesh_mod.NamedSharding(
                    self.mesh, self._stacked_spec))
            return jax.device_put(batch_u8, mesh_mod.NamedSharding(
                self.mesh, self._batch_spec))
        return jnp.asarray(batch_u8)

    # ------------------------------------------------------------------
    # encoder pre-training (C13 module-wise pre-training hook)
    # ------------------------------------------------------------------

    def pretrain_encoders(self) -> None:
        """Greedy layer-wise CD pre-training of DBN encoders [K]: train each
        RBM layer bottom-up on the previous layers' features; decoders
        untouched. No-op for pass-through encoders."""
        cfg = self.cfg
        n_layers = len(cfg.model.encoder_hidden)
        if n_layers == 0:
            return
        if cfg.train.pretrain_encoder_epochs == 0:
            # DBN encoders are FROZEN during joint training (decoder-facing
            # features are stop-gradient — models/encoders.features: joint
            # fine-tuning measurably collapses the latent channel), so CD
            # pre-training is their ONLY training. Zero epochs = random
            # frozen features; almost certainly a config mistake.
            self.log.warning(
                "DBN encoder (%s) with pretrain_encoder_epochs=0: the "
                "encoder is FROZEN during joint training, so it keeps "
                "whatever weights it was constructed/restored with — "
                "random init unless pre-trained externally; set "
                "train.pretrain_encoder_epochs>0 unless that is deliberate",
                cfg.model.encoder_hidden)
            return
        shared = cfg.model.mode in ("feedback", "joint", "hybrid")
        opt = optax.adam(cfg.train.pretrain_lr)

        def layer_loss(enc_params, key, x, layer):
            if shared:
                return enc_mod.pretrain_loss(enc_params, key, x, layer)
            keys = jax.random.split(key, cfg.model.n_tracks)
            losses = jax.vmap(
                lambda p, kk, xx: enc_mod.pretrain_loss(p, kk, xx, layer)
            )(enc_params, keys, x)
            return jnp.mean(losses)

        @partial(jax.jit, static_argnames=("layer",))
        def pre_step(enc_params, opt_state, batch, key, layer):
            # plain global-view jit: XLA samplers on any multi-device mesh
            with self._sampler_ctx(manual=False):
                x = batch.astype(jnp.float32)
                if cfg.model.mode == "joint":
                    b, t, k, d = x.shape
                    x = x.reshape(b, t, k * d)
                else:
                    x = jnp.moveaxis(x, 2, 0)    # (K, B, T, D)
                loss, grads = jax.value_and_grad(layer_loss)(
                    enc_params, key, x, layer)
                updates, opt_state = opt.update(grads, opt_state, enc_params)
                return (optax.apply_updates(enc_params, updates), opt_state,
                        loss)

        enc_params = self.params.encoder
        # visible-bias marginal init (encoders.init_visible_biases): start
        # the decode conditional CALIBRATED to the data marginal — without
        # it, CD on ~1%-density pianorolls needs ~10^4 steps just to escape
        # the all-off optimum, and an under-trained decode re-scales every
        # generated roll's density (measured 6.5x, r4)
        x_init = jnp.asarray(
            self.dataset.windows["train"][:2048].astype(np.float32))
        if cfg.model.mode == "joint":
            n, t, k, d = x_init.shape
            feats_cal = x_init.reshape(n, t, k * d)
            enc_params = enc_mod.init_visible_biases(enc_params, feats_cal)
        elif shared:
            feats_cal = jnp.moveaxis(x_init, 2, 0)      # (K, N, T, D)
            enc_params = enc_mod.init_visible_biases(enc_params, feats_cal)
        else:                       # per-track: leading K axis on params
            feats_cal = jnp.moveaxis(x_init, 2, 0)
            enc_params = jax.vmap(enc_mod.init_visible_biases)(
                enc_params, feats_cal)
        for layer in range(n_layers):
            opt_state = opt.init(enc_params)
            for ep in range(self.cfg.train.pretrain_encoder_epochs):
                losses = []
                for batch in self.dataset.batches("train", epoch=ep,
                                                  augment=True):
                    self.rng, k = jax.random.split(self.rng)
                    enc_params, opt_state, loss = pre_step(
                        enc_params, opt_state, jnp.asarray(batch), k, layer)
                    losses.append(float(loss))
                self.log.info("pretrain layer %d epoch %d cd-loss %.4f",
                              layer, ep, np.mean(losses))
        # decode-calibration diagnostic (encoders.decode_calibration): a
        # miscalibrated decode conditional re-scales the density of every
        # generated pianoroll no matter how good the decoder is — surface
        # it HERE, where more pretraining can still fix it
        if shared:
            cal = enc_mod.decode_calibration(enc_params, feats_cal)
        else:
            cal = jax.vmap(enc_mod.decode_calibration)(enc_params, feats_cal)
        cal = {k: float(jnp.mean(v)) for k, v in cal.items()}
        ratio = cal["decode_mean"] / max(cal["data_mean"], 1e-9)
        self.log.info(
            "pretrained decode calibration: data marginal %.4f, decode "
            "marginal %.4f (%.2fx), P(on|on-bit) %.3f, P(on|off-bit) %.4f",
            cal["data_mean"], cal["decode_mean"], ratio,
            cal["p_on_given_on"], cal["p_on_given_off"])
        if not 0.5 <= ratio <= 2.0:
            self.log.warning(
                "DBN decode conditional is MISCALIBRATED (decode marginal "
                "%.4f vs data %.4f): generated pianorolls will be ~%.1fx "
                "too %s; increase train.pretrain_encoder_epochs or "
                "train.pretrain_lr", cal["decode_mean"], cal["data_mean"],
                ratio if ratio > 1 else 1 / max(ratio, 1e-9),
                "dense" if ratio > 1 else "sparse")
        self.params = self.params.replace(encoder=enc_params)
        # the optimizer state must be rebuilt against the pretrained params
        # (HF keeps its own state object — optimizer is None there)
        if self._hf:
            from multinn_tpu.training import hf as hf_mod
            self.opt_state = hf_mod.init_state(self.params,
                                               self.cfg.train.hf_lambda0)
        else:
            self.opt_state = self.optimizer.init(self.params)

    # ------------------------------------------------------------------
    # checkpoint plumbing (§5.4: one artifact, three consumers)
    # ------------------------------------------------------------------

    def _state_dict(self) -> Dict[str, Any]:
        return {"params": self.params, "opt_state": self.opt_state,
                "rng": jax.random.key_data(self.rng) if jnp.issubdtype(
                    self.rng.dtype, jax.dtypes.prng_key) else self.rng,
                "step": self.step, "epoch": self.epoch,
                "epoch_step0": self.epoch_step0,
                "best_valid": self.best_valid}

    def save_checkpoint(self, metrics: Optional[Dict[str, float]] = None):
        saved = self.ckpt.save(self.step, self._state_dict(),
                               metrics=metrics)
        if not saved:
            self.log.warning("checkpoint save at step %d was refused "
                             "(duplicate step?)", self.step)

    def restore(self, step: Optional[int] = None) -> int:
        # sentinel: a pre-epoch_step0 checkpoint partial-restores to -1, in
        # which case we fall back to treating the step as an epoch boundary
        # (the old behavior: the partial epoch re-trains from batch 0)
        template = dict(self._state_dict(), epoch_step0=-1)
        state, at = self.ckpt.restore(template, step=step)
        self.params = state["params"]
        if state.pop("__opt_state_reset__", False):
            # cross-version opt_state structure change (checkpoint.py):
            # re-initialize fresh against the restored params. A fresh
            # state's step counters sit at 0, which would rewind warmup/
            # cosine schedules and Adam bias correction to init mid-run —
            # fast-forward every `count` leaf to the restored step.
            if self.optimizer is not None:
                fresh = self.optimizer.init(self.params)
                try:
                    import numpy as _np
                    import optax.tree_utils as otu
                    fresh = otu.tree_set(
                        fresh, count=_np.int32(int(state["step"])))
                except KeyError:     # stateless opt (plain sgd): no counts
                    pass
                self.opt_state = fresh
        else:
            self.opt_state = state["opt_state"]
        self.rng = jnp.asarray(state["rng"])
        self.step = int(state["step"])
        self.epoch = int(state["epoch"])
        self.epoch_step0 = int(state.get("epoch_step0", -1))
        if self.epoch_step0 < 0:
            self.epoch_step0 = self.step
        self.best_valid = float(state["best_valid"])
        self.log.info("restored checkpoint @ step %d (epoch %d, "
                      "%d batches into the epoch)",
                      self.step, self.epoch, self.step - self.epoch_step0)
        return at

    def maybe_resume(self) -> bool:
        if self.ckpt.latest_step() is not None:
            self.restore()
            return True
        return False

    # ------------------------------------------------------------------
    # loops
    # ------------------------------------------------------------------

    def profile_steps(self, n_steps: int) -> str:
        """Capture a device trace of n warmed-up train steps into
        <run_dir>/trace (TensorBoard / Perfetto — SURVEY §5.1)."""
        trace_dir = os.path.join(self.cfg.train.run_dir, "trace")
        batch = next(iter(self.dataset.batches("train", epoch=0)))
        dev_batch = self._put_batch(batch)
        # profiling must not perturb training: the traced steps run on
        # COPIES (the step donates its params/opt_state buffers, so the
        # trainer's own state would otherwise advance n_steps+1 optimizer
        # updates on one repeated batch without self.step moving — LR
        # schedule, Adam bias correction, and the checkpoint ledger would
        # all desynchronize)
        params, opt_state = jax.tree.map(jnp.copy,
                                         (self.params, self.opt_state))
        # warm the compile outside the trace
        params, opt_state, m = self._train_step(
            params, opt_state, dev_batch, jax.random.PRNGKey(0))
        profiling.force(m["loss"])
        with profiling.device_trace(trace_dir):
            for i in range(n_steps):
                params, opt_state, m = self._train_step(
                    params, opt_state, dev_batch, jax.random.PRNGKey(i + 1))
            profiling.force(m["loss"])
        self.log.info("wrote device trace of %d steps to %s",
                      n_steps, trace_dir)
        return trace_dir

    def _post_step(self, metrics, timing, n_steps: int) -> Dict[str, Any]:
        """timing: [last_logged_step, last_log_walltime]. Steps/sec comes
        from wall time between log events — the loop itself NEVER blocks on
        device results (a per-step block would serialize dispatch, which
        costs ~30 ms/step on tunneled TPUs; metrics are fetched only on log
        boundaries, where device_get provides the only synchronization)."""
        cfg = self.cfg.train
        prev = self.step
        self.step += n_steps
        out: Dict[str, Any] = {}
        if (cfg.fault_inject_step > 0
                and prev < cfg.fault_inject_step <= self.step):
            raise FaultInjected(f"fault injected at step {self.step}")
        if prev // cfg.log_every_steps != self.step // cfg.log_every_steps:
            metrics = jax.device_get(metrics)
            now = time.time()
            window = max(now - timing[1], 1e-9)
            metrics["steps_per_sec"] = (self.step - timing[0]) / window
            timing[0], timing[1] = self.step, now
            self.metrics_log.log(self.step, metrics, "train")
            self.log.info("step %d %s", self.step,
                          format_metrics(metrics,
                                         ("loss", "f1", "grad_norm",
                                          "steps_per_sec")))
            out = metrics
        if cfg.ckpt_every_steps and (
                prev // cfg.ckpt_every_steps
                != self.step // cfg.ckpt_every_steps
                # train() saves at every epoch end (with metrics on eval
                # epochs); a periodic save at the same step number would
                # claim the step and make orbax refuse the metric-carrying
                # save as a duplicate — silently breaking best-checkpoint
                # selection
                and self.step != self._epoch_final_step):
            self.save_checkpoint()
        return out

    def train_epoch(self) -> Dict[str, float]:
        cfg = self.cfg.train
        self._epoch_final_step = (self.epoch_step0
                                  + self.dataset.n_batches("train"))
        timing = [self.step, time.time()]    # [last_logged_step, walltime]
        last_metrics: Dict[str, Any] = {}
        spc = max(cfg.steps_per_call, 1)

        def run_single(batch):
            nonlocal last_metrics
            self.rng, key = jax.random.split(self.rng)
            log_step = ((self.step + 1) % cfg.log_every_steps == 0)
            step_fn = (self._train_step_detailed if log_step
                       else self._train_step)
            self.params, self.opt_state, metrics = step_fn(
                self.params, self.opt_state, self._put_batch(batch), key)
            m = self._post_step(metrics, timing, 1)
            if m:
                last_metrics = m

        # if a fault is scheduled, run single-step so it fires at the exact
        # step (§5.3 CI contract); otherwise fuse spc steps per dispatch
        fuse = self._train_multi is not None and cfg.fault_inject_step <= 0
        # exact mid-epoch resume: the batch order is deterministic per
        # (seed, epoch), so skipping the already-consumed prefix replays
        # nothing and drops nothing (checkpoints carry epoch_step0)
        skip = self.step - self.epoch_step0
        if skip:
            self.log.info("resuming epoch %d at batch %d", self.epoch, skip)
        pending: list = []
        for i, batch in enumerate(
                self.dataset.batches("train", epoch=self.epoch,
                                     augment=True)):
            if i < skip:
                continue
            if not fuse:
                run_single(batch)
                continue
            pending.append(batch)
            if len(pending) == spc:
                stacked = np.stack(pending)
                pending.clear()
                self.rng, key = jax.random.split(self.rng)
                self.params, self.opt_state, metrics = self._train_multi(
                    self.params, self.opt_state,
                    self._put_batch(stacked), key)
                m = self._post_step(metrics, timing, spc)
                if m:
                    last_metrics = m
        for batch in pending:                # leftover < spc: single steps
            run_single(batch)
        return last_metrics

    def evaluate(self, split: str = "valid") -> Dict[str, float]:
        """Frame-weighted metrics over the split (the eval step returns
        frame-weighted sums; this divides by the total real-frame count).
        The tail batch is short, never zero-FRAME-padded into the averages:
        under gspmd it evaluates replicated at its own shape; under shard_map
        it is padded to the mesh's data width with zero-MASK windows, which
        contribute exactly zero frames and zero weighted sums (loss/metrics
        are mask-aware), so both paths are exact for metrics linear in
        frames (losses, LL). Ratio metrics (f1/precision/recall) are frame-
        weighted averages whose granularity is per-batch here and
        additionally per-shard under shard_map (micro-vs-macro averaging). Per-track vector metrics
        (e.g. ``loss_per_track``) are expanded to ``<name>_k`` entries —
        multi-track health stays visible at eval (SURVEY C15)."""
        sums: Dict[str, np.ndarray] = {}
        n_frames_total = 0.0
        key = jax.random.PRNGKey(self.cfg.train.seed + 1000 + self.epoch)
        explicit_shard_map = self.mesh is not None and not self._gspmd
        n_data = (self.mesh.shape[mesh_mod.DATA_AXIS]
                  if self.mesh is not None else 1)
        for batch, mask in self.dataset.batches(split, shuffle=False,
                                                drop_remainder=False,
                                                with_masks=True):
            if explicit_shard_map and len(batch) % n_data:
                pad = n_data - (len(batch) % n_data)
                batch = np.concatenate(
                    [batch, np.zeros((pad, *batch.shape[1:]), batch.dtype)])
                mask = np.concatenate(
                    [mask, np.zeros((pad, *mask.shape[1:]), mask.dtype)])
            key, k = jax.random.split(key)
            m = jax.device_get(self._eval_step(
                self.params, self._put_batch(batch), k,
                self._put_batch(mask)))
            n_frames_total += float(np.asarray(m.pop("n_frames")))
            for name, v in m.items():
                a = np.asarray(v)
                if a.ndim <= 1:
                    sums[name] = sums.get(name, 0.0) + a
        denom = max(n_frames_total, 1.0)
        out: Dict[str, float] = {}
        for name, v in sums.items():
            if np.ndim(v) == 0:
                out[name] = float(v) / denom
            else:
                for i, vi in enumerate(np.asarray(v)):
                    out[f"{name}_{i}"] = float(vi) / denom
        return out

    def _log_image_summaries(self) -> None:
        """TB pianoroll image summaries at eval time (SURVEY C19): a
        free-running sample from the current params (tag valid/sample) and,
        once, a ground-truth validation window (valid/reference). Params are
        a global pytree in every mesh style, so a plain jitted generate
        works here; the sample is a picture, not an evaluation metric."""
        window = int(self.cfg.data.window)
        if self._imgsum_gen is None:
            @partial(jax.jit, static_argnames=("n_steps",))
            def _gen(params, key, n_steps):
                state = multinn.init_state(params, 1)
                _, roll = multinn.generate(params, key, state, n_steps,
                                           fused=False)
                return roll.astype(jnp.uint8)
            self._imgsum_gen = _gen
            ref = np.asarray(self.dataset.windows["valid"][0])
            self.metrics_log.log_image(
                "valid/reference", self.dataset.decode(ref[None])[0],
                self.step)
        self.rng, k = jax.random.split(self.rng)
        # plain global-view jit: XLA samplers on any multi-device mesh
        with self._sampler_ctx(manual=False):
            roll = np.asarray(jax.device_get(
                self._imgsum_gen(self.params, k, window)))[0]
        self.metrics_log.log_image(
            "valid/sample", self.dataset.decode(roll[None])[0], self.step)

    def train(self) -> Dict[str, float]:
        cfg = self.cfg.train
        self.log.info("training '%s': %d train windows, model=%s/%s mode=%s",
                      self.cfg.name, len(self.dataset.windows["train"]),
                      self.cfg.model.decoder_type, self.cfg.model.cell,
                      self.cfg.model.mode)
        if self.epoch == 0 and self.step == 0:
            self.pretrain_encoders()
        final_eval: Dict[str, float] = {}
        while self.epoch < cfg.epochs:
            t0 = time.time()
            self.train_epoch()
            self.epoch += 1
            self.epoch_step0 = self.step
            if self.epoch % cfg.eval_every_epochs == 0:
                ev = self.evaluate("valid")
                final_eval = ev
                self.metrics_log.log(self.step, ev, "valid")
                if cfg.image_summaries:
                    self._log_image_summaries()
                self.log.info("epoch %d (%.1fs) valid %s", self.epoch,
                              time.time() - t0,
                              format_metrics(ev, ("loss", "f1",
                                                  "ll_per_frame")))
                # Model selection / early stopping use the per-frame
                # (pseudo-)log-likelihood, NOT the raw training loss: the CD
                # surrogate is not a likelihood and can decrease unboundedly
                # as weights grow, which would always select the first epoch.
                if "ll_per_frame" in ev:
                    valid_loss = -float(ev["ll_per_frame"])
                else:
                    valid_loss = float(ev.get("loss", np.inf))
                self.save_checkpoint(metrics={"valid_loss": valid_loss})
                if valid_loss < self.best_valid - 1e-6:
                    self.best_valid = valid_loss
                    self._bad_epochs = 0
                else:
                    self._bad_epochs += 1
                    if (cfg.early_stop_patience
                            and self._bad_epochs >= cfg.early_stop_patience):
                        self.log.info("early stop at epoch %d", self.epoch)
                        break
            else:
                self.save_checkpoint()
        self.ckpt.wait()
        return final_eval

    def close(self) -> None:
        self.metrics_log.close()
        self.ckpt.close()
