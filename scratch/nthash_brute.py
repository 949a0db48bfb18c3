import itertools
M64=(1<<64)-1
CONSTS=[0x3c8bfbb395c60474,0x3193c18562a02b4c,0x20323ed082572324,0x295549f54be24456]
def rol(x,d):
    d%=64
    return ((x<<d)|(x>>(64-d)))&M64 if d else x
def srol1(x):
    m=((x&0x8000000000000000)>>30)|((x&0x100000000)>>32)
    return ((x<<1)&0xFFFFFFFDFFFFFFFE)|m
SROL_CACHE={}
def srol(x,d):
    key=(x,d%1023)
    if key in SROL_CACHE: return SROL_CACHE[key]
    y=x
    for _ in range(d%1023): y=srol1(y)
    SROL_CACHE[key]=y
    return y
RCIDX=[3,2,1,0]  # A<->T, C<->G when bases coded 0..3 = A,C,G,T
def fhash(codes,seeds,roll):
    k=len(codes); h=0
    for j,b in enumerate(codes):
        h^=roll(seeds[b],k-1-j)
    return h
MULTISEED=0x90b45d39fb6da1fa; MULTISHIFT=27
def nte64(h,k,i):
    t=(h*((i^(k*MULTISEED))&M64))&M64
    t^=t>>MULTISHIFT
    return t
def splitmix(h):
    h=(h^(h>>30))*0xbf58476d1ce4e5b9&M64
    h=(h^(h>>27))*0x94d049bb133111eb&M64
    return h^(h>>31)
def murmur(h):
    h^=h>>33; h=h*0xff51afd7ed558ccd&M64
    h^=h>>33; h=h*0xc4ceb9fe1a85ec53&M64
    return h^(h>>33)
MIXES=[('id',lambda h,k:h)]+[(f'nte{i}',lambda h,k,i=i:nte64(h,k,i)) for i in range(5)]+[('splitmix',lambda h,k:splitmix(h)),('murmur',lambda h,k:murmur(h))]
CANONS=[('min',lambda f,r:min(f,r)),('xor',lambda f,r:f^r),('add',lambda f,r:(f+r)&M64),('fh',lambda f,r:f),('rh',lambda f,r:r)]
ROLLS=[('rol',rol),('srol',srol)]

seq=[]
with open('/root/reference/tests/scaffolds_1.fa') as f:
    for line in f:
        if line.startswith('>'):
            if seq: break
            continue
        seq.append(line.strip())
seq=''.join(seq)
B2I={'A':0,'C':1,'G':2,'T':3}
targets=[(177,3940627884194749360,'+'),(297,15842758737602341501,'+'),(638,18264252465449822990,'-')]
k=32
hits=[]
for perm in itertools.permutations(range(4)):
    seeds=[CONSTS[perm[i]] for i in range(4)]
    for rname,roll in ROLLS:
        # precompute fh, rh per target
        vals=[]
        for pos,want,strand in targets:
            codes=[B2I[c] for c in seq[pos:pos+k]]
            fh=fhash(codes,seeds,roll)
            rh=fhash([RCIDX[b] for b in reversed(codes)],seeds,roll)
            vals.append((fh,rh,want,strand))
        for cname,canon in CANONS:
            for mname,mix in MIXES:
                ok=all(mix(canon(fh,rh),k)==want for fh,rh,want,strand in vals)
                if ok:
                    hits.append((perm,rname,cname,mname))
                    print('HIT',perm,rname,cname,mname)
if not hits: print('no hits')
