"""Training: teacher trainer, student distiller, resume, checkpoints."""
from .state import (
    TrainState,
    create_train_state,
    make_optimizer,
    make_state_init_fn,
    make_eval_model_fn,
    make_eval_fn_from_config,
    make_teacher_train_step,
    make_distill_train_step,
)
from .checkpoints import (
    AsyncCheckpointWriter,
    save_checkpoint,
    load_checkpoint,
    latest_epoch,
    available_epochs,
    variables_from_checkpoint,
    checkpoint_path,
    abstract_target,
    save_checkpoint_sharded,
    load_checkpoint_sharded,
    available_epochs_sharded,
    sharded_checkpoint_path,
)
from .teacher import train_teacher, generate_sample_grid
from .students import (
    train_students,
    distill_diffusion_model,
    load_teacher,
    print_size_factor_info,
)
from .continue_training import continue_training
from .progressive import (
    progressive_distill,
    make_progressive_distill_step,
    make_guided_eval_fn,
)
