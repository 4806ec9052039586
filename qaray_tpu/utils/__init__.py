from qaray_tpu.utils.timing import FrameTimer
