import sys

from audio_denoising_tpu.cli import main

sys.exit(main())
