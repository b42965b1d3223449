from yak_tpu.ops.hash import hash64, hash64_inv, hash64_64, hash_long
from yak_tpu.ops.encode import NT4_TABLE, encode_bases
from yak_tpu.ops.kmers import extract_kmer_hashes
