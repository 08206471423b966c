from .wav import Wave, load_wav, write_wav, float_to_wave
