"""Depth-evaluation metrics with eigen/garg crops
(reference `zoedepth/utils/misc.py:159-246`)."""

from __future__ import annotations

import numpy as np


def compute_errors(gt: np.ndarray, pred: np.ndarray) -> dict:
    """a1/a2/a3, abs_rel, sq_rel, rmse, rmse_log, log_10, silog over valid
    (already-masked/flattened) arrays."""
    thresh = np.maximum(gt / pred, pred / gt)
    a1 = float((thresh < 1.25).mean())
    a2 = float((thresh < 1.25 ** 2).mean())
    a3 = float((thresh < 1.25 ** 3).mean())
    abs_rel = float(np.mean(np.abs(gt - pred) / gt))
    sq_rel = float(np.mean(((gt - pred) ** 2) / gt))
    rmse = float(np.sqrt(((gt - pred) ** 2).mean()))
    rmse_log = float(np.sqrt(((np.log(gt) - np.log(pred)) ** 2).mean()))
    err = np.log(pred) - np.log(gt)
    # Variance clamped at 0: float cancellation can drive E[e^2]-E[e]^2
    # fractionally negative for near-constant errors, which NaN'd silog.
    silog = float(
        np.sqrt(max(np.mean(err ** 2) - np.mean(err) ** 2, 0.0)) * 100)
    log_10 = float(np.mean(np.abs(np.log10(gt) - np.log10(pred))))
    return dict(a1=a1, a2=a2, a3=a3, abs_rel=abs_rel, rmse=rmse,
                log_10=log_10, rmse_log=rmse_log, silog=silog,
                sq_rel=sq_rel)


def compute_metrics(gt: np.ndarray, pred: np.ndarray,
                    min_depth_eval: float = 1e-3,
                    max_depth_eval: float = 10.0,
                    crop: str | None = None,
                    garg_crop: bool = False,
                    eigen_crop: bool = False) -> dict:
    """Clamp, crop (garg/eigen), mask and compute errors
    (`misc.py:200-246`)."""
    pred = pred.squeeze()
    gt = gt.squeeze()
    pred = np.clip(pred, min_depth_eval, max_depth_eval)
    pred[np.isinf(pred)] = max_depth_eval
    pred[np.isnan(pred)] = min_depth_eval
    valid = (gt > min_depth_eval) & (gt < max_depth_eval)
    if garg_crop or eigen_crop or crop in ("garg", "eigen"):
        gh, gw = gt.shape
        eval_mask = np.zeros_like(valid)
        if garg_crop or crop == "garg":
            eval_mask[int(0.40810811 * gh):int(0.99189189 * gh),
                      int(0.03594771 * gw):int(0.96405229 * gw)] = 1
        else:
            eval_mask[int(0.3324324 * gh):int(0.91351351 * gh),
                      int(0.0359477 * gw):int(0.96405229 * gw)] = 1
        valid &= eval_mask.astype(bool)
    return compute_errors(gt[valid], pred[valid])


class RunningAverageDict:
    """Streaming metric averages (`misc.py:74-95`)."""

    def __init__(self):
        self._sums: dict = {}
        self._count = 0

    def update(self, new: dict) -> None:
        self._count += 1
        for k, v in new.items():
            self._sums[k] = self._sums.get(k, 0.0) + v

    def get_value(self) -> dict:
        return {k: v / max(self._count, 1) for k, v in self._sums.items()}


def evaluate_dataset(apply_fn, params, dataset, preset: dict,
                     batch: int = 1, use_tta: bool = True,
                     limit: int | None = None) -> dict:
    """Run a depth model over an eval dataset with the preset's caps/crop
    (the reference `BaseTrainer.validate` + compute_metrics loop)."""
    import jax.numpy as jnp

    from .infer import infer_with_tta

    ra = RunningAverageDict()
    n = len(dataset) if limit is None else min(limit, len(dataset))
    for i in range(n):
        s = dataset[i]
        x = jnp.asarray(s.image)[None]
        if use_tta:
            pred = infer_with_tta(apply_fn, params, x)[0]
        else:
            pred = apply_fn(params, x)["metric_depth"][0]
        ra.update(compute_metrics(
            np.asarray(s.depth), np.asarray(pred),
            min_depth_eval=preset.get("min_depth_eval", 1e-3),
            max_depth_eval=preset.get("max_depth_eval", 10.0),
            garg_crop=preset.get("garg_crop", False),
            eigen_crop=preset.get("eigen_crop", False)))
    return ra.get_value()
