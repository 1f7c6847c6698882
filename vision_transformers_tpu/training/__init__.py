from vision_transformers_tpu.training.trainer import fit, make_train_state, train_step_fn, eval_step_fn
from vision_transformers_tpu.training.optimizers import make_optimizer
