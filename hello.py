"""Quickstart: programmatic vamping (reference hello.py).

Downloads the default models from the HF hub on first use (or point the
Interface at local checkpoints — see README "programmatic usage").
"""
import jax

from vampnet_tpu.audio import AudioSignal
from vampnet_tpu.interface import Interface

# load the default vampnet model
interface = Interface.default()

# list available finetuned models
finetuned_model_choices = interface.available_models()
print(f"available models: {finetuned_model_choices}")

# pick one
model_choice = finetuned_model_choices[0]
print(f"choosing model: {model_choice}")

# load it
interface.load_finetuned(model_choice)

# load an example audio file
signal = AudioSignal("assets/example.wav")

# get the tokens for the audio
codes = interface.encode(signal)

# build a mask for the audio
mask = interface.build_mask(
    codes, signal,
    periodic_prompt=13,
    upper_codebook_mask=3,
    seed=42,
)

# generate the output tokens
output_tokens = interface.vamp(
    codes, mask, return_mask=False, temperature=1.0, typical_filtering=True,
    seed=42,
)

# convert them to a signal
output_signal = interface.decode(output_tokens)

# write the output signal to a file
from pathlib import Path
Path("scratch").mkdir(exist_ok=True)
output_signal.write("scratch/output.wav")
print("wrote scratch/output.wav")
