"""Command-line resampler: python -m clownresampler_tpu in.wav out.wav <rate> [lpf]

The CLI twin of the reference's test harnesses (tests/test-high-level.c usage:
input, output, rates) operating on WAV files; writes 16-bit clamped output.
"""

import sys

from clownresampler_tpu import resample_array
from clownresampler_tpu.utils.audio_io import clamp_s16, read_wav, write_wav


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 3:
        print(__doc__.strip(), file=sys.stderr)
        return 2
    in_path, out_path, out_rate = argv[0], argv[1], int(argv[2])
    frames, in_rate = read_wav(in_path)
    lpf = int(argv[3]) if len(argv) > 3 else out_rate
    wide = resample_array(frames, in_rate, out_rate, lpf)
    write_wav(out_path, clamp_s16(wide), out_rate)
    print(f"{in_path} ({in_rate} Hz, {frames.shape[0]} frames) -> "
          f"{out_path} ({out_rate} Hz, {wide.shape[0]} frames)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
