"""LR schedule for the generic segmentation trainer.

Parity notes (reference: refinenet/deeplab/utils/lr_scheduler.py):
  * poly:  lr·(1 - T/N)^0.9,  cos:  0.5·lr·(1 + cos(π·T/N)),
    step:  lr·0.1^(epoch // lr_step), with T = epoch·iters_per_epoch + i
    (lr_scheduler.py:43-52);
  * linear warmup over warmup_epochs·iters_per_epoch steps
    (lr_scheduler.py:53-55);
  * 'step' mode asserts a nonzero lr_step AT CONSTRUCTION
    (lr_scheduler.py:35-36) — train.py never passes one, so
    ``--lr-scheduler step`` aborts in the reference too;
  * param groups past the first run at 10× (lr_scheduler.py:63-70) — here
    that multiplier lives in the optimizer's head mask
    (trainer.make_optimizer), so the schedule is a pure step->float
    function fed to the jitted program as a runtime scalar (no recompiles).
"""
from __future__ import annotations

import math


class LRScheduler:
    def __init__(self, mode: str, base_lr: float, num_epochs: int,
                 iters_per_epoch: int = 0, lr_step: int = 0,
                 warmup_epochs: int = 0):
        if mode not in ("cos", "poly", "step"):
            raise NotImplementedError(mode)
        print(f"Using {mode} LR Scheduler!")
        self.mode = mode
        self.lr = base_lr
        if mode == "step":
            assert lr_step
        self.lr_step = lr_step
        self.iters_per_epoch = iters_per_epoch
        self.N = num_epochs * iters_per_epoch
        self.warmup_iters = warmup_epochs * iters_per_epoch

    def __call__(self, i: int, epoch: int) -> float:
        T = epoch * self.iters_per_epoch + i
        if self.mode == "cos":
            lr = 0.5 * self.lr * (1 + math.cos(1.0 * T / self.N * math.pi))
        elif self.mode == "poly":
            lr = self.lr * pow(1 - 1.0 * T / self.N, 0.9)
        else:  # step
            lr = self.lr * (0.1 ** (epoch // self.lr_step))
        if self.warmup_iters > 0 and T < self.warmup_iters:
            lr = lr * 1.0 * T / self.warmup_iters
        assert lr >= 0
        return lr
