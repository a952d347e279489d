from diffsheg_tpu.sampling.generator import WindowGenerator
from diffsheg_tpu.sampling.live import LiveSession
from diffsheg_tpu.sampling.pipeline import FusedPipeline
from diffsheg_tpu.sampling.streamer import StreamingGenerator, get_windows
