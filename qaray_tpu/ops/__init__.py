from qaray_tpu.ops.trace import trace_closest, trace_shadow
