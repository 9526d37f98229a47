"""Packaging for speech_inpainting_tpu (replaces the reference's setup.py,
which installs the repo as an editable 'Speech Inpainting' package)."""
from setuptools import find_packages, setup

setup(
    name="speech-inpainting-tpu",
    version="0.1.0",
    description="TPU-native speech inpainting (HuBERT + HiFi-GAN, JAX/XLA)",
    packages=find_packages(include=["speech_inpainting_tpu",
                                    "speech_inpainting_tpu.*"]),
    python_requires=">=3.10",
    install_requires=["jax", "flax", "optax", "orbax-checkpoint", "numpy",
                      "scipy"],
    extras_require={
        "convert": ["torch", "transformers", "joblib"],
        "eval": ["transformers"],
    },
    entry_points={
        "console_scripts": [
            "sit-train-ea = speech_inpainting_tpu.cli.train_ea:main",
            "sit-train-hifigan = speech_inpainting_tpu.cli.train_hifigan:main",
            "sit-train-da = speech_inpainting_tpu.cli.train_da:main",
            "sit-train-f0vq = speech_inpainting_tpu.cli.train_f0vq:main",
            "sit-predict = speech_inpainting_tpu.cli.predict_ea:main",
            "sit-inpaint-da = speech_inpainting_tpu.cli.inpaint_da:main",
            "sit-kmeans = speech_inpainting_tpu.cli.kmeans_cli:main",
            "sit-prep = speech_inpainting_tpu.cli.prep:main",
            "sit-vocode = speech_inpainting_tpu.cli.vocode:main",
            "sit-export = speech_inpainting_tpu.cli.export_aot:main",
            "sit-score = speech_inpainting_tpu.cli.score:main",
            "sit-predict-asr = speech_inpainting_tpu.cli.predict_asr:main",
        ]
    },
)
