"""Model zoo: Flax diffusion U-Net (teacher/student unified)."""
from .unet import (
    DiffusionUNet,
    SimpleUNet,
    StudentUNet,
    make_unet,
    init_unet,
    make_init_fn,
    param_count,
    param_size_mb,
    sinusoidal_time_embedding,
    upsample_bilinear_x2,
    resize_bilinear_align_corners,
)
from .torch_port import (
    import_reference_unet_checkpoint,
    infer_size_factor,
    unet_variables_from_torch_state_dict,
)
from .quantized import (
    calibrate_activation_scales,
    make_quantized_eval_fn,
    quantize_unet_variables,
    quantized_unet_apply,
)
