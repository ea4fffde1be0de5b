"""Early stopping on eval loss (reference Utils.py:14-47).

Semantics preserved: the counter increments whenever the eval loss *rises
above* best + delta; any non-increase (even a plateau) resets the counter and
adopts the new value as best.
"""

from __future__ import annotations


class EarlyStopping:
    def __init__(self, patience: int = 5, delta: float = 0.0,
                 verbose: bool = False):
        self.patience = patience
        self.delta = delta
        self.verbose = verbose
        self.counter = 0
        self.best_score = None
        self.early_stop = False

    def __call__(self, val_loss: float) -> bool:
        if self.best_score is None:
            self.best_score = val_loss
        elif val_loss > self.best_score + self.delta:
            self.counter += 1
            if self.verbose:
                print(f"Validation loss increased [{self.counter}/{self.patience}]")
            if self.counter >= self.patience:
                self.early_stop = True
        else:
            self.best_score = val_loss
            self.counter = 0
        return self.early_stop
