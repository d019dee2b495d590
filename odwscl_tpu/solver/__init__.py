from .build import (warmup_multistep_schedule, sgd_with_momentum_correction,
                    param_labels, make_optimizer, make_optimizer_tx)

__all__ = ["warmup_multistep_schedule", "sgd_with_momentum_correction",
           "param_labels", "make_optimizer", "make_optimizer_tx"]
