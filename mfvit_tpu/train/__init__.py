from mfvit_tpu.train import evaluator, metrics, optim, profiler, steps  # noqa: F401
from mfvit_tpu.train.metrics import (AverageMeter, ProgressMeter,  # noqa: F401
                                     macro_ovr_auc, top1_acc)
from mfvit_tpu.train.optim import build_optimizer, lars  # noqa: F401
from mfvit_tpu.train.steps import (make_classifier_steps,  # noqa: F401
                                   make_fusion_steps, softmax_ce)
