from diffsheg_tpu.compat.torch_ckpt import (
    convert_unidiffuser_state_dict,
    load_reference_checkpoint,
    expected_reference_keys,
)
