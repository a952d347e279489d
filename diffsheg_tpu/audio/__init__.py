from diffsheg_tpu.audio.mel import MelFrontend, mel_filterbank, stft_magsq
from diffsheg_tpu.audio.wav import load_wav, resample_poly
