from truetrace_tpu.diff.render_grad import (  # noqa: F401
    render_loss_and_grad, set_material_params, get_material_params)
