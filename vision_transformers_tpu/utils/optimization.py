"""Hyperparameter optimization.

The reference's Optuna objective is broken — syntax error, undefined
model/loaders, study never optimized (utils/optimization.py:11-88,
SURVEY.md §2.9.1). This is the intended capability, working: an
``objective`` over the same search space (num_layers, mlp_dim, dropouts, lr,
optimizer ∈ {Adam, SGD, RMSprop}, optimization.py:11-33) with median-pruner
style reporting, runnable either under optuna (if installed) or with the
built-in random-search fallback ``run_study`` (this environment has no
optuna).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

import numpy as np


SEARCH_SPACE = {
    "num_layers": (2, 8),                 # int range
    "mlp_dim": [256, 512, 1024],          # categorical
    "dropout": (0.0, 0.3),                # float range
    "attention_dropout": (0.0, 0.3),
    "lr": (1e-5, 1e-2, "log"),
    "optimizer": ["adam", "sgd", "rmsprop"],
}


class TrialPruned(Exception):
    pass


@dataclass
class Trial:
    """Minimal optuna-compatible trial for the fallback search."""

    params: Dict[str, Any] = field(default_factory=dict)
    reports: List[float] = field(default_factory=list)
    _rng: np.random.RandomState = field(
        default_factory=lambda: np.random.RandomState(0))
    _median_history: Optional[List[List[float]]] = None

    def suggest_int(self, name, low, high):
        v = int(self._rng.randint(low, high + 1))
        self.params[name] = v
        return v

    def suggest_float(self, name, low, high, log=False):
        if log:
            v = float(np.exp(self._rng.uniform(np.log(low), np.log(high))))
        else:
            v = float(self._rng.uniform(low, high))
        self.params[name] = v
        return v

    def suggest_categorical(self, name, choices):
        v = choices[int(self._rng.randint(len(choices)))]
        self.params[name] = v
        return v

    def report(self, value, step):
        self.reports.append(float(value))

    def should_prune(self) -> bool:
        """Median pruning: prune if current value is below the median of
        completed trials at the same step."""
        if not self._median_history or not self.reports:
            return False
        step = len(self.reports) - 1
        peers = [h[step] for h in self._median_history if len(h) > step]
        if len(peers) < 2:
            return False
        return self.reports[-1] < float(np.median(peers))


def objective(trial, *, model_cls, base_args: Dict[str, Any],
              train_loader, val_loader, num_epochs: int = 3,
              fit_fn: Optional[Callable] = None) -> float:
    """Search-space objective (intended behavior of optimization.py:11-76):
    suggest hyperparameters, train, report per-epoch val accuracy for
    pruning, return final val accuracy."""
    from vision_transformers_tpu.training.trainer import fit

    fit_fn = fit_fn or fit
    args = dict(base_args)
    args["num_layers"] = trial.suggest_int("num_layers", *SEARCH_SPACE["num_layers"])
    args["mlp_dim"] = trial.suggest_categorical("mlp_dim", SEARCH_SPACE["mlp_dim"])
    args["dropout"] = trial.suggest_float("dropout", 0.0, 0.3)
    args["attention_dropout"] = trial.suggest_float("attention_dropout", 0.0, 0.3)
    lr = trial.suggest_float("lr", 1e-5, 1e-2, log=True)
    optimizer = trial.suggest_categorical("optimizer", SEARCH_SPACE["optimizer"])

    model = model_cls(**args)
    acc = 0.0
    state = None  # carried across epochs so training is progressive
    for epoch in range(num_epochs):
        hist = fit_fn(
            model, train_loader, val_loader, epochs=1,
            val_loader=val_loader, lr=lr, optimizer=optimizer, verbose=False,
            state=state,
        )
        state = hist.get("final_state", None)
        acc = hist["val_accuracy"][-1]
        trial.report(acc, epoch)
        if trial.should_prune():
            raise TrialPruned()
    return acc


@dataclass
class Study:
    trials: List[Trial] = field(default_factory=list)
    values: List[Optional[float]] = field(default_factory=list)

    @property
    def best_trial(self) -> Trial:
        best = int(np.nanargmax([v if v is not None else np.nan
                                 for v in self.values]))
        return self.trials[best]

    @property
    def best_value(self) -> float:
        return float(np.nanmax([v if v is not None else np.nan
                                for v in self.values]))


def run_study(objective_fn: Callable[[Trial], float], n_trials: int = 10,
              seed: int = 0) -> Study:
    """Random-search driver with median pruning — the working stand-in for
    ``study.optimize`` (never called in the reference, optimization.py:78)."""
    study = Study()
    history: List[List[float]] = []
    for i in range(n_trials):
        trial = Trial(_rng=np.random.RandomState(seed + i))
        trial._median_history = history
        try:
            value = objective_fn(trial)
            study.values.append(value)
        except TrialPruned:
            study.values.append(None)
        study.trials.append(trial)
        history.append(trial.reports)
    return study
