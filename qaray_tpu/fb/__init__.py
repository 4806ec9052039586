from qaray_tpu.fb.framebuffer import FrameBuffer
