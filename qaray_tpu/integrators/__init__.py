from qaray_tpu.integrators.engine import render_batch, IntegratorConfig
