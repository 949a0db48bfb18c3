import numpy as np

# candidate seed tables (ntHash)
SEED = {'A':0x3c8bfbb395c60474,'C':0x3193c18562a02b4c,'G':0x20323ed082572324,'T':0x295549f54be24456}
M64 = (1<<64)-1

def rol(x, d=1):
    d %= 64
    return ((x << d) | (x >> (64-d))) & M64

def srol1(x):
    m = ((x & 0x8000000000000000) >> 30) | ((x & 0x100000000) >> 32)
    return ((x << 1) & 0xFFFFFFFDFFFFFFFE) | m

def srol(x, d):
    for _ in range(d % 1023):
        x = srol1(x)
    return x

RC = {'A':'T','C':'G','G':'C','T':'A'}

def fhash(s, roll):  # H = XOR_j roll^{k-1-j}(seed[s_j])
    k=len(s); h=0
    for j,b in enumerate(s):
        h ^= roll(SEED[b], k-1-j)
    return h

def probe(seq, pos, k, want):
    kmer = seq[pos:pos+k]
    rckmer = ''.join(RC[b] for b in reversed(kmer))
    for name, roll in [('rol', rol), ('srol', srol)]:
        fh = fhash(kmer, roll); rh = fhash(rckmer, roll)
        print(f"{name}: fh={fh} rh={rh} min={min(fh,rh)} want={want} "
              f"fh_match={fh==want} rh_match={rh==want} min_match={min(fh,rh)==want}")

seq = []
with open('/root/reference/tests/scaffolds_1.fa') as f:
    for line in f:
        if line.startswith('>'):
            if seq: break
            continue
        seq.append(line.strip())
seq = ''.join(seq)
# golden: first minimizers 3940627884194749360:177:+  15842758737602341501:297:+ 18264252465449822990:638:-
probe(seq, 177, 32, 3940627884194749360)
probe(seq, 297, 32, 15842758737602341501)
probe(seq, 638, 32, 18264252465449822990)
