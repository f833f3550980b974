from ctseg_tpu.utils.attrdict import AttrDict  # noqa: F401
