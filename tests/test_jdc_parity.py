"""JDCNet (F0 teacher) golden parity vs the torch reference."""

import numpy as np
import torch

from ref_stubs import install_reference

install_reference()

import jax
import jax.numpy as jnp

from facodec_tpu.models.jdc import JDCNet, convert_jdc_state_dict


def test_jdc_parity():
    import sys

    sys.path.insert(0, "/root/reference")
    from modules.JDC.model import JDCNet as TJDC

    torch.manual_seed(0)
    ref = TJDC(num_class=1, seq_len=192).eval()
    # make BN stats non-trivial
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    B, T = 2, 24
    mel = torch.randn(B, 1, 80, T)
    with torch.no_grad():
        f0, gan_feat, pool = ref(mel)

    mod = JDCNet(num_class=1)
    params = {"params": convert_jdc_state_dict(ref.state_dict())}
    got_f0, _ = jax.jit(mod.apply)(params, jnp.asarray(mel[:, 0].numpy()).transpose(0, 2, 1))

    np.testing.assert_allclose(np.asarray(got_f0), f0.numpy(), rtol=2e-4, atol=2e-4)
