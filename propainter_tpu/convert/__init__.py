from propainter_tpu.convert.torch_to_jax import (
    convert_state_dict,
    load_torch_checkpoint,
    assert_tree_shapes_match,
)
