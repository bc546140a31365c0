from .timing import Stopwatch, ThroughputMeter, device_trace
