"""ASR-based WER/CER via Whisper (gated on model availability).

The reference transcribes with Whisper-small and scores WER/CER against the
target text (I_ea/metrics.py:80-119). This environment has no network egress,
so loading succeeds only from a local cache — `WhisperScorer.available()`
gates cleanly and the eval harness reports WER/CER as None when absent.

The reference's alternative `recognize_speech` engines (google / sphinx via
the SpeechRecognition package, I_ea/metrics.py:64-79) are cloud APIs /
absent binaries under the same egress constraint, so they are deliberately
not wrapped; `metrics/units.py` UER is the offline intelligibility proxy
the eval tables carry instead.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..data.audio import resample
from .objective import cer, normalize_text, wer


class WhisperScorer:
    def __init__(self, model_name: str = "openai/whisper-small",
                 cache_dir: Optional[str] = None, device: str = "cpu"):
        from transformers import (WhisperForConditionalGeneration,
                                  WhisperProcessor)
        self.processor = WhisperProcessor.from_pretrained(
            model_name, cache_dir=cache_dir, local_files_only=True)
        self.model = WhisperForConditionalGeneration.from_pretrained(
            model_name, cache_dir=cache_dir, local_files_only=True).to(device)
        self.model.config.forced_decoder_ids = \
            self.processor.get_decoder_prompt_ids(language="english",
                                                  task="transcribe")
        self.device = device

    @staticmethod
    def available(model_name: str = "openai/whisper-small",
                  cache_dir: Optional[str] = None) -> bool:
        try:
            from transformers import WhisperProcessor
            WhisperProcessor.from_pretrained(model_name, cache_dir=cache_dir,
                                             local_files_only=True)
            return True
        except Exception:
            return False

    def transcribe(self, audio: np.ndarray, sr: int) -> str:
        import torch
        if sr != 16000:
            audio = resample(np.asarray(audio, np.float32), sr, 16000)
        feats = self.processor(audio, sampling_rate=16000,
                               return_tensors="pt").input_features
        with torch.no_grad():
            ids = self.model.generate(feats.to(self.device))
        text = self.processor.batch_decode(ids, skip_special_tokens=True)[0]
        return normalize_text(text)

    def wer_cer(self, audio: np.ndarray, sr: int, target_text: str
                ) -> Tuple[float, float, str]:
        hyp = self.transcribe(audio, sr)
        tgt = normalize_text(target_text)
        return wer(tgt, hyp, normalize=False), \
            cer(tgt, hyp, normalize=False), hyp
