import numpy as np
M64=np.uint64(0xFFFFFFFFFFFFFFFF)
SEEDS=np.array([0x3c8bfbb395c60474,0x3193c18562a02b4c,0x20323ed082572324,0x295549f54be24456],dtype=np.uint64)

def srol_vec(x,d):
    x=np.asarray(x,dtype=np.uint64)
    A=(x>>np.uint64(33))&np.uint64((1<<31)-1)
    B=x&np.uint64((1<<33)-1)
    da=d%31; db=d%33
    if da: A=((A<<np.uint64(da))|(A>>np.uint64(31-da)))&np.uint64((1<<31)-1)
    if db: B=((B<<np.uint64(db))|(B>>np.uint64(33-db)))&np.uint64((1<<33)-1)
    return (A<<np.uint64(33))|B

def nthash_all(codes,k):
    """codes int8 0..3 (or 4=N). returns (out,canon,fwd,valid) for all kmer starts."""
    n=len(codes); m=n-k+1
    fh=np.zeros(m,dtype=np.uint64); rh=np.zeros(m,dtype=np.uint64)
    cc=np.clip(codes,0,3)
    for j in range(k):
        fh^=srol_vec(SEEDS[cc[j:j+m]],k-1-j)
        rh^=srol_vec(SEEDS[3-cc[j:j+m]],j)
    canon=(fh+rh)&M64
    mult=np.uint64((1^(k*0x90b45d39fb6da1fa))&0xFFFFFFFFFFFFFFFF)
    with np.errstate(over='ignore'):
        t=canon*mult
    t=t^(t>>np.uint64(27))
    bad=(codes>3).astype(np.int32)
    badc=np.convolve(bad,np.ones(k,dtype=np.int32),'valid')>0 if bad.any() else np.zeros(m,bool)
    return t,canon,fh<=rh,~np.asarray(badc,bool)

B2I=np.full(256,4,dtype=np.int8)
for i,c in enumerate('ACGT'): B2I[ord(c)]=i; B2I[ord(c.lower())]=i

def minimizers(seq,k,w,select='canon'):
    codes=B2I[np.frombuffer(seq.encode(),dtype=np.uint8)]
    out,canon,fwd,valid=nthash_all(codes,k)
    vidx=np.nonzero(valid)[0]
    key=canon if select=='canon' else out
    kv=key[vidx]
    res=[];prev=-1
    for s in range(0,len(vidx)-w+1):
        p=vidx[s+int(np.argmin(kv[s:s+w]))]
        if p!=prev: res.append(int(p)); prev=p
    return [(int(out[p]),p,bool(fwd[p])) for p in res]

def read_fasta(path):
    name=None;chunks=[]
    for line in open(path):
        if line.startswith('>'):
            if name: yield name,''.join(chunks)
            name=line[1:].split()[0];chunks=[]
        else: chunks.append(line.strip())
    if name: yield name,''.join(chunks)

import sys
for fa,k,w in [('scaffolds_1.fa',32,250),('scaffolds_2.fa',32,100),('scaffolds_3.fa',24,250),('scaffolds_4.fa',40,100)]:
    golden={}
    gpath=f'/root/reference/tests/expected_outputs/{fa}.k{k}.w{w}.tsv'
    for line in open(gpath):
        parts=line.rstrip('\n').split('\t')
        golden[parts[0]]=parts[1].split(' ') if len(parts)>1 and parts[1] else []
    for select in ['canon','out']:
        ok=True
        for name,seq in read_fasta(f'/root/reference/tests/{fa}'):
            mins=minimizers(seq,k,w,select)
            mine=[f"{h}:{p}:{'+' if f else '-'}" for h,p,f in mins]
            g=golden.get(name,[])
            if mine!=g:
                ok=False
                diffs=[i for i,(a,b) in enumerate(zip(mine,g)) if a!=b]
                print(f"{fa} select={select} {name}: MISMATCH len {len(mine)} vs {len(g)} firstdiff {diffs[:1]} {[ (mine[i],g[i]) for i in diffs[:2]]}")
                break
        if ok: print(f"{fa} k={k} w={w} select={select}: FULL MATCH")
