"""Helpers for golden-value parity tests against the PyTorch reference."""

import numpy as np
import torch

from videotransformer_tpu.models.convert import merge_params, torch_to_flax_params


def torch_state_to_flax(torch_module, flax_params, attention_type="divided_space_time"):
    """Copy a torch module's weights into a flax param tree; assert full coverage."""
    sd = {k: v.detach().cpu().numpy() for k, v in torch_module.state_dict().items()}
    imported = torch_to_flax_params(sd, attention_type)
    merged, missing, unexpected = merge_params(flax_params, imported)
    assert not missing, f"missing: {missing}"
    assert not unexpected, f"unexpected: {unexpected}"
    return merged


def assert_close(jax_out, torch_out, rtol=1e-5, atol=1e-5, msg=""):
    a = np.asarray(jax_out)
    b = torch_out.detach().cpu().numpy() if isinstance(torch_out, torch.Tensor) else np.asarray(torch_out)
    assert a.shape == b.shape, f"{msg} shape {a.shape} vs {b.shape}"
    np.testing.assert_allclose(a, b, rtol=rtol, atol=atol, err_msg=msg)
