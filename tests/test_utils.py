"""Misc k-diffusion utility surface: PIL conversions, n_params,
download_file hash check, CSVLogger (ref: k_diffusion/utils.py)."""


def test_pil_roundtrip_and_misc():
    import hashlib
    import os
    import tempfile

    import numpy as np
    from PIL import Image

    from kdip_tpu import utils

    img = Image.fromarray(np.uint8(np.arange(48).reshape(4, 4, 3)))
    x = utils.from_pil_image(img)
    assert x.shape == (4, 4, 3) and -1 <= x.min() and x.max() <= 1
    assert np.array_equal(np.asarray(utils.to_pil_image(x[None])),
                          np.asarray(img))

    import jax.numpy as jnp
    assert utils.n_params({"a": jnp.zeros((2, 3)), "b": jnp.zeros(5)}) == 11

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "f.csv")
        lg = utils.CSVLogger(p, ["step", "loss"])
        lg.write(1, 0.5)
        lg.file.close()
        assert open(p).read() == "step,loss\n1,0.5\n"
        fp = os.path.join(d, "blob.bin")
        open(fp, "wb").write(b"hello")
        utils.download_file(fp, "http://unused",
                            hashlib.sha256(b"hello").hexdigest())
        import pytest
        with pytest.raises(OSError):
            utils.download_file(fp, "http://unused", "0" * 64)
