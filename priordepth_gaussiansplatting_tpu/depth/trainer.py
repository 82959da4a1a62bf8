"""Data-parallel depth trainer — the TPU-native counterpart of the
reference's only distributed-training code (`zoedepth/trainers/
base_trainer.py` + `zoedepth_trainer.py`, SURVEY.md §2.11/§5.8).

DDP/NCCL → a jax.sharding data mesh: batches are sharded over devices, the
gradient all-reduce is inserted by XLA from the sharding annotations; the
reference's rank-0 gating maps to `jax.process_index() == 0`; multi-host
setup is one `jax.distributed.initialize()` before mesh construction.
Optimizer: AdamW + OneCycle LR (`base_trainer.py:44-140` semantics), SILog +
λ·GradL1 loss (`zoedepth_trainer.py:39-104`), domain-CE added for the NK
router (`zoedepth_nk_trainer.py:36-80`).
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import losses


def onecycle_lr(step, total_steps: int, max_lr: float,
                pct_start: float = 0.3, div_factor: float = 25.0,
                final_div_factor: float = 100.0):
    """OneCycleLR (cos anneal) as a pure function of the step."""
    warm = jnp.maximum(total_steps * pct_start, 1.0)
    init_lr = max_lr / div_factor
    final_lr = init_lr / final_div_factor
    step = jnp.asarray(step, jnp.float32)
    up = init_lr + (max_lr - init_lr) * 0.5 * (
        1.0 - jnp.cos(jnp.pi * jnp.clip(step / warm, 0.0, 1.0)))
    t = jnp.clip((step - warm) / jnp.maximum(total_steps - warm, 1.0),
                 0.0, 1.0)
    down = final_lr + (max_lr - final_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * t))
    return jnp.where(step < warm, up, down)


@dataclasses.dataclass
class DepthTrainerConfig:
    lr: float = 1.61e-4
    weight_decay: float = 0.01
    epochs: int = 5
    steps_per_epoch: int = 1000
    w_grad: float = 0.5        # GradL1 weight (w_si = 1)
    w_domain: float = 0.1      # NK router CE weight
    min_depth: float = 1e-3
    max_depth: float = 10.0
    checkpoint_dir: str = ""
    # Experiment logging (reference base_trainer.py:151-156 wandb setup;
    # here the framework MetricsLogger: TB when available + JSONL).
    log_dir: str = ""
    log_every: int = 50


class DepthTrainer:
    """One-mesh data-parallel trainer for the flax depth models."""

    def __init__(self, model, cfg: DepthTrainerConfig,
                 mesh: Optional[Mesh] = None, seed: int = 0):
        self.model = model
        self.cfg = cfg
        devices = np.asarray(jax.devices())
        self.mesh = mesh or Mesh(devices, ("data",))
        self.rng = jax.random.PRNGKey(seed)
        total = cfg.epochs * cfg.steps_per_epoch
        self.tx = optax.chain(
            optax.clip_by_global_norm(0.1),
            optax.adamw(lambda s: onecycle_lr(s, total, cfg.lr),
                        weight_decay=cfg.weight_decay))
        self.params = None
        self.opt_state = None
        self.step_count = 0
        self._jit_step = None
        # Rank-0-only structured experiment logging (the reference's wandb
        # role, base_trainer.py:151-156/197-199): scalars per train step,
        # eval metric dicts, colorized depth images.
        self.logger = None
        if cfg.log_dir and self.is_rank_zero:
            from ..utils.logging import MetricsLogger  # noqa: PLC0415
            self.logger = MetricsLogger(cfg.log_dir)

    @property
    def is_rank_zero(self) -> bool:
        return jax.process_index() == 0

    def init(self, sample_image: jnp.ndarray) -> None:
        self.rng, k = jax.random.split(self.rng)
        self.params = self.model.init(k, sample_image)
        self.opt_state = self.tx.init(self.params)

        data_sharding = NamedSharding(self.mesh, P("data"))
        repl = NamedSharding(self.mesh, P())

        def loss_fn(params, image, depth_gt, mask, domain=None):
            out = self.model.apply(params, image)
            pred = jnp.clip(out["metric_depth"], self.cfg.min_depth,
                            self.cfg.max_depth)
            loss = losses.silog_loss(pred, depth_gt, mask)
            loss += self.cfg.w_grad * losses.grad_l1_loss(pred, depth_gt,
                                                          mask)
            if domain is not None and "domain_logits" in out:
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    out["domain_logits"], domain).mean()
                loss += self.cfg.w_domain * ce
            return loss

        @partial(jax.jit,
                 in_shardings=(repl, repl, data_sharding, data_sharding,
                               data_sharding),
                 out_shardings=(repl, repl, repl),
                 donate_argnums=(0, 1))
        def train_step(params, opt_state, image, depth_gt, mask):
            loss, grads = jax.value_and_grad(loss_fn)(params, image,
                                                      depth_gt, mask)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._jit_step = train_step

    def train_step(self, image, depth_gt, mask):
        """image (B,H,W,3), depth_gt/mask (B,H,W), B sharded over devices."""
        self.params, self.opt_state, loss = self._jit_step(
            self.params, self.opt_state, image, depth_gt, mask)
        self.step_count += 1
        loss = float(loss)
        if self.logger and self.step_count % self.cfg.log_every == 0:
            self.logger.scalar("Train/loss", loss, self.step_count)
        return loss

    def log_eval(self, metrics: dict, prefix: str = "Metrics") -> None:
        """Log an eval-metric dict (reference base_trainer.py:197-199)."""
        if self.logger:
            self.logger.scalars({f"{prefix}/{k}": float(v)
                                 for k, v in metrics.items()},
                                self.step_count)

    def log_depth_images(self, image, depth_gt, pred,
                         tag: str = "Eval") -> None:
        """Colorized input/GT/prediction triplet
        (reference base_trainer.py:289-308 log_images)."""
        if not self.logger:
            return
        from .metrics import colorize  # noqa: PLC0415
        img = np.asarray(image).squeeze()
        gt = np.asarray(depth_gt).squeeze()
        pr = np.asarray(pred).squeeze()
        self.logger.image(f"{tag}/input",
                          np.transpose(np.clip(img, 0, 1), (2, 0, 1)),
                          self.step_count)
        for name, d in (("gt", gt), ("pred", pr)):
            rgba = colorize(d, invalid_mask=~np.isfinite(d) | (d <= 0))
            self.logger.image(
                f"{tag}/{name}",
                np.transpose(rgba[..., :3] / 255.0, (2, 0, 1)),
                self.step_count)

    def save_checkpoint(self, name: str = "latest.pkl") -> None:
        """Rank-0-only model checkpoint; optimizer state deliberately
        dropped (`base_trainer.py:273-287`)."""
        if not self.is_rank_zero or not self.cfg.checkpoint_dir:
            return
        os.makedirs(self.cfg.checkpoint_dir, exist_ok=True)
        path = os.path.join(self.cfg.checkpoint_dir, name)
        with open(path, "wb") as f:
            pickle.dump({"params": jax.tree.map(np.asarray, self.params),
                         "step": self.step_count}, f)

    def load_checkpoint(self, path: str) -> None:
        with open(path, "rb") as f:
            payload = pickle.load(f)
        self.params = jax.tree.map(jnp.asarray, payload["params"])
        self.step_count = payload["step"]
        self.opt_state = self.tx.init(self.params)
