from . import design, dft, frame, gabor, mel
