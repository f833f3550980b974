from ctseg_tpu.interpret.gradcam import gradcam, gradcam_all_structures  # noqa: F401
