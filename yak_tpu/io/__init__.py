from yak_tpu.io.yakfmt import dump_yak, restore_yak, apply_load_mode
from yak_tpu.io.fasta import FastxReader, read_batches
