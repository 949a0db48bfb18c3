/* ntlink_chain — native per-read anchor chaining + verbose formatting.
 *
 * Exact C implementation of the chaining acceptance semantics
 * (mapping.chain_read_hits; reference ntlink_utils.py:200-294):
 *   z filter -> noisy-span filter -> consecutive runs -> subsume marking
 *   (specific | sensitive) -> merge adjacent same-contig runs,
 * plus the verbose_mapping line rendering, so the mapping hot loop touches
 * each anchor zero times in Python.
 *
 * API:
 *   Chainer(contig_lengths: int32 buffer, names: list[str])
 *     .chain(cids, cpos, rpos, sbits: int32 buffers, n, read_len, k, z, x,
 *            sensitive, read_name or None)
 *       -> (runs, verbose_bytes | None)
 *   runs: list of (cid, hit_count,
 *                  first_cpos, first_rpos, first_bits,
 *                  last_cpos, last_rpos, last_bits)
 *   sbits: bit0 = contig strand is '+', bit1 = read strand is '+'.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
    PyObject_HEAD
    int32_t *clen;
    Py_ssize_t n_contigs;
    PyObject *names; /* list of str */
    Py_buffer clen_view;
} ChainerObject;

static void Chainer_dealloc(ChainerObject *self)
{
    if (self->clen_view.obj)
        PyBuffer_Release(&self->clen_view);
    Py_XDECREF(self->names);
    Py_TYPE(self)->tp_free((PyObject *)self);
}

static PyObject *Chainer_new(PyTypeObject *type, PyObject *args, PyObject *kwds)
{
    PyObject *clen_obj, *names;
    if (!PyArg_ParseTuple(args, "OO", &clen_obj, &names))
        return NULL;
    if (!PyList_Check(names)) {
        PyErr_SetString(PyExc_TypeError, "names must be a list");
        return NULL;
    }
    ChainerObject *self = (ChainerObject *)type->tp_alloc(type, 0);
    if (!self)
        return NULL;
    memset(&self->clen_view, 0, sizeof(self->clen_view));
    if (PyObject_GetBuffer(clen_obj, &self->clen_view, PyBUF_SIMPLE) < 0) {
        Py_DECREF(self);
        return NULL;
    }
    self->clen = (int32_t *)self->clen_view.buf;
    self->n_contigs = self->clen_view.len / 4;
    Py_INCREF(names);
    self->names = names;
    return (PyObject *)self;
}

typedef struct {
    int32_t cid;
    int32_t start; /* index into kept[] */
    int32_t end;   /* exclusive */
    int subsumed;
} Run;

static PyObject *Chainer_chain(ChainerObject *self, PyObject *args)
{
    Py_buffer cids_v, cpos_v, rpos_v, sbits_v;
    Py_ssize_t n;
    long read_len, k, z;
    double x;
    int sensitive;
    PyObject *read_name;
    if (!PyArg_ParseTuple(args, "y*y*y*y*nlllidO", &cids_v, &cpos_v, &rpos_v,
                          &sbits_v, &n, &read_len, &k, &z, &sensitive, &x,
                          &read_name))
        return NULL;
    const int32_t *cids = cids_v.buf;
    const int32_t *cpos = cpos_v.buf;
    const int32_t *rpos = rpos_v.buf;
    const int32_t *sbits = sbits_v.buf;

    PyObject *result = NULL;
    int32_t *kept = PyMem_Malloc(sizeof(int32_t) * (n ? n : 1));
    Run *runs = PyMem_Malloc(sizeof(Run) * (n ? n : 1));
    int32_t *final_idx = PyMem_Malloc(sizeof(int32_t) * (n ? n : 1));
    Run *final_runs = PyMem_Malloc(sizeof(Run) * (n ? n : 1));
    if (!kept || !runs || !final_idx || !final_runs)
        goto done_nomem;

    /* 1. z filter */
    Py_ssize_t n_kept = 0;
    for (Py_ssize_t i = 0; i < n; i++) {
        int32_t c = cids[i];
        if (c >= 0 && c < self->n_contigs && self->clen[c] >= z)
            kept[n_kept++] = (int32_t)i;
    }

    /* 2. noisy-span filter: per contig, first-occurrence min/max of cpos */
    /* collect distinct contigs among kept (usually tiny) */
    {
        int32_t distinct[256];
        int32_t mn[256], mx[256], mn_r[256], mx_r[256], cnt[256];
        Py_ssize_t n_distinct = 0;
        int overflow = 0;
        for (Py_ssize_t ki = 0; ki < n_kept; ki++) {
            int32_t c = cids[kept[ki]];
            Py_ssize_t d;
            for (d = 0; d < n_distinct; d++)
                if (distinct[d] == c)
                    break;
            if (d == n_distinct) {
                if (n_distinct == 256) {
                    overflow = 1;
                    break;
                }
                distinct[n_distinct] = c;
                mn[n_distinct] = mx[n_distinct] = cpos[kept[ki]];
                mn_r[n_distinct] = mx_r[n_distinct] = rpos[kept[ki]];
                cnt[n_distinct] = 1;
                n_distinct++;
            } else {
                cnt[d]++;
                if (cpos[kept[ki]] < mn[d]) {
                    mn[d] = cpos[kept[ki]];
                    mn_r[d] = rpos[kept[ki]];
                }
                if (cpos[kept[ki]] > mx[d]) {
                    mx[d] = cpos[kept[ki]];
                    mx_r[d] = rpos[kept[ki]];
                }
            }
        }
        if (overflow) {
            /* >256 distinct contigs on one read: bail to the Python path */
            PyErr_SetString(PyExc_OverflowError, "too many contigs");
            goto done;
        }
        for (Py_ssize_t d = 0; d < n_distinct; d++) {
            if (cnt[d] < 2)
                continue;
            long span = (long)mx[d] - (long)mn[d];
            if (span < 0)
                span = -span;
            int noisy;
            if (x == 0.0) {
                noisy = span > read_len + k;
            } else {
                long rspan = (long)mx_r[d] - (long)mn_r[d];
                if (rspan < 0)
                    rspan = -rspan;
                double threshold = x * (double)rspan + (double)k;
                double cap = (double)(read_len + k);
                if (threshold > cap)
                    threshold = cap;
                noisy = (double)span > threshold;
            }
            if (noisy) {
                Py_ssize_t w = 0;
                for (Py_ssize_t ki = 0; ki < n_kept; ki++)
                    if (cids[kept[ki]] != distinct[d])
                        kept[w++] = kept[ki];
                n_kept = w;
            }
        }
    }

    /* 3. consecutive runs */
    Py_ssize_t n_runs = 0;
    for (Py_ssize_t ki = 0; ki < n_kept; ki++) {
        int32_t c = cids[kept[ki]];
        if (n_runs && runs[n_runs - 1].cid == c) {
            runs[n_runs - 1].end = (int32_t)(ki + 1);
        } else {
            runs[n_runs].cid = c;
            runs[n_runs].start = (int32_t)ki;
            runs[n_runs].end = (int32_t)(ki + 1);
            runs[n_runs].subsumed = 0;
            n_runs++;
        }
    }

    /* 4. subsume marking */
    if (sensitive) {
        /* mark runs strictly between consecutive sightings of a contig */
        for (Py_ssize_t i = 0; i < n_runs; i++) {
            for (Py_ssize_t j = i + 1; j < n_runs; j++) {
                if (runs[j].cid == runs[i].cid) {
                    for (Py_ssize_t m = i + 1; m < j; m++)
                        runs[m].subsumed = 1;
                    break; /* consecutive pair (i, j); next pair starts at j */
                }
            }
        }
    } else {
        /* specific: contigs nested between repeat sightings are fully out */
        for (Py_ssize_t i = 0; i < n_runs; i++) {
            Py_ssize_t first = -1;
            for (Py_ssize_t j = 0; j < i; j++) {
                if (runs[j].cid == runs[i].cid) {
                    first = j;
                    break;
                }
            }
            if (first >= 0) {
                for (Py_ssize_t m = first + 1; m < i; m++) {
                    int32_t doomed = runs[m].cid;
                    for (Py_ssize_t q = 0; q < n_runs; q++)
                        if (runs[q].cid == doomed)
                            runs[q].subsumed = 1;
                }
            }
        }
    }

    /* 5. drop subsumed, merge adjacent same-contig runs (rebuild indices) */
    Py_ssize_t n_final = 0;
    Py_ssize_t out_pos = 0;
    for (Py_ssize_t i = 0; i < n_runs; i++) {
        if (runs[i].subsumed)
            continue;
        if (n_final && final_runs[n_final - 1].cid == runs[i].cid) {
            for (int32_t ki = runs[i].start; ki < runs[i].end; ki++)
                final_idx[out_pos++] = kept[ki];
            final_runs[n_final - 1].end = (int32_t)out_pos;
        } else {
            final_runs[n_final].cid = runs[i].cid;
            final_runs[n_final].start = (int32_t)out_pos;
            for (int32_t ki = runs[i].start; ki < runs[i].end; ki++)
                final_idx[out_pos++] = kept[ki];
            final_runs[n_final].end = (int32_t)out_pos;
            n_final++;
        }
    }

    /* build outputs */
    {
        PyObject *run_list = PyList_New(n_final);
        if (!run_list)
            goto done;
        for (Py_ssize_t i = 0; i < n_final; i++) {
            int32_t a = final_idx[final_runs[i].start];
            int32_t b = final_idx[final_runs[i].end - 1];
            PyObject *tup = Py_BuildValue(
                "iiiiiiii", (int)final_runs[i].cid,
                (int)(final_runs[i].end - final_runs[i].start), (int)cpos[a],
                (int)rpos[a], (int)sbits[a], (int)cpos[b], (int)rpos[b],
                (int)sbits[b]);
            if (!tup) {
                Py_DECREF(run_list);
                goto done;
            }
            PyList_SET_ITEM(run_list, i, tup);
        }

        PyObject *verbose = Py_None;
        if (read_name != Py_None && n_final > 0) {
            /* render all verbose lines for this read into one bytes blob */
            const char *rname = PyUnicode_AsUTF8(read_name);
            if (!rname) {
                Py_DECREF(run_list);
                goto done;
            }
            Py_ssize_t cap = 64;
            for (Py_ssize_t i = 0; i < n_final; i++) {
                PyObject *cn = PyList_GetItem(self->names, final_runs[i].cid);
                Py_ssize_t cn_len = cn ? PyUnicode_GET_LENGTH(cn) : 0;
                cap += 64 + strlen(rname) + 4 * cn_len +
                       48 * (final_runs[i].end - final_runs[i].start);
            }
            char *buf = PyMem_Malloc(cap);
            if (!buf) {
                Py_DECREF(run_list);
                goto done_nomem;
            }
            char *p = buf;
            for (Py_ssize_t i = 0; i < n_final; i++) {
                PyObject *cname_obj =
                    PyList_GetItem(self->names, final_runs[i].cid);
                const char *cname =
                    cname_obj ? PyUnicode_AsUTF8(cname_obj) : NULL;
                if (!cname) {
                    PyMem_Free(buf);
                    Py_DECREF(run_list);
                    goto done;
                }
                p += sprintf(p, "%s\t%s\t%d\t", rname, cname,
                             (int)(final_runs[i].end - final_runs[i].start));
                for (int32_t ki = final_runs[i].start; ki < final_runs[i].end;
                     ki++) {
                    int32_t h = final_idx[ki];
                    p += sprintf(p, "%d:%c_%d:%c", (int)cpos[h],
                                 (sbits[h] & 1) ? '+' : '-', (int)rpos[h],
                                 (sbits[h] & 2) ? '+' : '-');
                    *p++ = (ki + 1 < final_runs[i].end) ? ' ' : '\n';
                }
            }
            verbose = PyBytes_FromStringAndSize(buf, p - buf);
            PyMem_Free(buf);
            if (!verbose) {
                Py_DECREF(run_list);
                goto done;
            }
        } else {
            Py_INCREF(Py_None);
        }
        result = PyTuple_Pack(2, run_list, verbose);
        Py_DECREF(run_list);
        Py_DECREF(verbose);
    }
    goto done;

done_nomem:
    PyErr_NoMemory();
done:
    PyMem_Free(kept);
    PyMem_Free(runs);
    PyMem_Free(final_idx);
    PyMem_Free(final_runs);
    PyBuffer_Release(&cids_v);
    PyBuffer_Release(&cpos_v);
    PyBuffer_Release(&rpos_v);
    PyBuffer_Release(&sbits_v);
    return result;
}

static PyMethodDef Chainer_methods[] = {
    {"chain", (PyCFunction)Chainer_chain, METH_VARARGS,
     "chain(cids, cpos, rpos, sbits, n, read_len, k, z, sensitive, x, "
     "read_name) -> (runs, verbose_bytes|None)"},
    {NULL, NULL, 0, NULL},
};

static PyTypeObject ChainerType = {
    PyVarObject_HEAD_INIT(NULL, 0)
    .tp_name = "ntlink_chain.Chainer",
    .tp_basicsize = sizeof(ChainerObject),
    .tp_dealloc = (destructor)Chainer_dealloc,
    .tp_flags = Py_TPFLAGS_DEFAULT,
    .tp_doc = "Per-read anchor chaining",
    .tp_methods = Chainer_methods,
    .tp_new = Chainer_new,
};

static PyModuleDef chain_module = {
    PyModuleDef_HEAD_INIT,
    .m_name = "ntlink_chain",
    .m_doc = "Native anchor chaining + verbose formatting",
    .m_size = -1,
};

PyMODINIT_FUNC PyInit_ntlink_chain(void)
{
    if (PyType_Ready(&ChainerType) < 0)
        return NULL;
    PyObject *m = PyModule_Create(&chain_module);
    if (!m)
        return NULL;
    Py_INCREF(&ChainerType);
    if (PyModule_AddObject(m, "Chainer", (PyObject *)&ChainerType) < 0) {
        Py_DECREF(&ChainerType);
        Py_DECREF(m);
        return NULL;
    }
    return m;
}
