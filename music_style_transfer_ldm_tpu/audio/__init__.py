"""On-device DSP: the TPU-native replacement for the reference's librosa chain.

Everything here is pure JAX (jit/vmap/scan friendly, static shapes) and
batched over a leading batch dimension, so the whole
audio -> mel image -> audio pipeline runs on device; the reference bounces
through CPU numpy/librosa for every step (ref: data/audio_processor.py).

Submodules (import them directly; functions whose names collide with their
module — stft, nnls — are only exported here under the module):

  stft        frame/STFT/ISTFT                  (audio.stft.stft, .istft)
  mel         Slaney filterbank + dB math       (audio.mel.melspectrogram, ...)
  quantize    dB <-> uint8/[0,1] image codec
  nnls        batched FISTA mel inversion       (audio.nnls.nnls)
  griffinlim  fast Griffin-Lim + mel_to_audio
  io          host-side WAV/ffmpeg file I/O
  processor   AudioProcessor facade (reference AudioPreprocessor parity)
"""

from music_style_transfer_ldm_tpu.audio import stft, mel, quantize, nnls  # noqa: F401
from music_style_transfer_ldm_tpu.audio import griffinlim, io  # noqa: F401
from music_style_transfer_ldm_tpu.audio.stft import (  # noqa: F401
    istft, frame_signal, hann_window, num_frames,
)
from music_style_transfer_ldm_tpu.audio.mel import (  # noqa: F401
    mel_filterbank, hz_to_mel, mel_to_hz, melspectrogram,
    power_to_db, db_to_power, amplitude_to_db, db_to_amplitude,
)
from music_style_transfer_ldm_tpu.audio.quantize import (  # noqa: F401
    db_to_uint8_image, uint8_image_to_db, db_to_unit_image, unit_image_to_db,
    unit_image_to_uint8,
)
from music_style_transfer_ldm_tpu.audio.griffinlim import (  # noqa: F401
    griffin_lim, mel_to_stft, mel_to_audio,
)
from music_style_transfer_ldm_tpu.audio.processor import AudioProcessor  # noqa: F401
