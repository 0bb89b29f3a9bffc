"""Host-side ReduceLROnPlateau, matching torch's semantics.

The reference steps torch's scheduler on the validation mixed-point-distance
mean (pytorch-sandbox/train.py:107-109, 273): mode='min', factor=0.5,
patience=15, threshold=1e-4 (relative), cooldown=0, min_lr=1e-7.
"""

from __future__ import annotations


class ReduceLROnPlateau:
    def __init__(
        self,
        initial_lr: float,
        factor: float = 0.5,
        patience: int = 15,
        threshold: float = 1e-4,
        min_lr: float = 1e-7,
    ):
        self.lr = initial_lr
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = float("inf")
        self.num_bad_epochs = 0

    def step(self, metric: float, n_epochs: int = 1) -> float:
        """Record a metric covering ``n_epochs`` epochs; returns the lr.

        ``patience`` is denominated in EPOCHS (torch semantics,
        pytorch-sandbox/train.py:107-109 with per-epoch eval).  When eval is
        amortized over ``eval_every`` epochs, callers pass that count so a
        non-improving eval burns ``eval_every`` epochs of patience — not one.
        With n_epochs=1 this is trace-exact vs torch (test_parallel.py).
        """
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += n_epochs
            if self.num_bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad_epochs = 0
        return self.lr
