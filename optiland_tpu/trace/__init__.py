from optiland_tpu.trace.tracer import TraceHistory, trace_system, trace_rays
from optiland_tpu.trace.raygen import generate_rays

__all__ = ["TraceHistory", "trace_system", "trace_rays", "generate_rays"]
