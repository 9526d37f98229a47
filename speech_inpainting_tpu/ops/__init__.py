from .conv import (avg_pool1d, conv1d, conv2d, conv_transpose1d, get_padding,
                   weight_norm_kernel)
from .mel import (HUBERT_ALIGNED_MEL_22K, VOCODER_MEL_16K,
                  VOCODER_MEL_16K_FULLBAND, VOCODER_MEL_22K,
                  VOCODER_MEL_22K_FULLBAND, MelConfig,
                  dynamic_range_compression, dynamic_range_decompression,
                  mel_filterbank, mel_spectrogram)
from .masking import (frame_mask, mask_span, mask_wave_frames,
                      mask_wave_samples, splice_frames)
from .resize import extend_mel, interp_linear, regrid_mel_to
from .stft import frame_count, stft_complex, stft_magnitude
