/* Fast MagicaVoxel .vox chunk parser (C, CPython extension).
 *
 * Native analog of the reference's ogt_vox usage (lib/ogt/ogt_vox.h,
 * vv.cpp:12-54): parses RIFF chunks MAIN/PACK/SIZE/XYZI/RGBA and returns,
 * per model, the dense grid ALREADY remapped to the engine's (Z, Y, X)
 * layout (our (X,Y,Z) = (vox_y, vox_z, vox_x), vox Y flipped — vv.cpp:39-49)
 * so Python does zero per-voxel work.  Falls back to the pure-Python parser
 * (models/vox.py) when the extension is not built.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

static uint32_t rd_u32(const uint8_t *p) {
    return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
           ((uint32_t)p[3] << 24);
}

/* parse_vox(data: bytes) ->
 *   (models: list[(sx, sy, sz, grid_bytes)], palette: bytes[1024])
 * grid_bytes is the remapped dense grid, C-order (Z=sx, Y=sz, X=sy). */
static PyObject *parse_vox(PyObject *self, PyObject *args) {
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "y*", &buf))
        return NULL;
    const uint8_t *data = (const uint8_t *)buf.buf;
    Py_ssize_t len = buf.len;

    if (len < 8 || memcmp(data, "VOX ", 4) != 0) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "not a .vox file");
        return NULL;
    }

    PyObject *models = PyList_New(0);
    uint8_t palette[1024];
    /* default palette: filled lazily by Python on miss; zero here */
    memset(palette, 0, sizeof palette);
    int have_palette = 0;

    /* collected SIZE chunks awaiting matching XYZI */
    uint32_t sizes[256][3];
    int n_sizes = 0, n_xyzi = 0;

    Py_ssize_t pos = 8;
    while (pos + 12 <= len) {
        const uint8_t *ch = data + pos;
        uint32_t n = rd_u32(ch + 4);
        Py_ssize_t content = pos + 12;
        Py_ssize_t next = content + (Py_ssize_t)n;
        if (next > len && memcmp(ch, "MAIN", 4) != 0)
            break;

        if (memcmp(ch, "MAIN", 4) == 0) {
            next = content; /* descend into children */
        } else if (memcmp(ch, "SIZE", 4) == 0 && n >= 12) {
            if (n_sizes < 256) {
                sizes[n_sizes][0] = rd_u32(data + content);
                sizes[n_sizes][1] = rd_u32(data + content + 4);
                sizes[n_sizes][2] = rd_u32(data + content + 8);
                n_sizes++;
            }
        } else if (memcmp(ch, "XYZI", 4) == 0 && n >= 4) {
            if (n_xyzi < n_sizes) {
                uint32_t sx = sizes[n_xyzi][0], sy = sizes[n_xyzi][1],
                         sz = sizes[n_xyzi][2];
                n_xyzi++;
                uint32_t cnt = rd_u32(data + content);
                if ((Py_ssize_t)(4 + (size_t)cnt * 4) > (Py_ssize_t)n)
                    cnt = (uint32_t)((n - 4) / 4);
                /* output grid dims: Z=sx, Y=sz, X=sy */
                size_t gz = sx, gy = sz, gx = sy;
                PyObject *grid = PyBytes_FromStringAndSize(NULL,
                    (Py_ssize_t)(gz * gy * gx));
                if (!grid) { Py_DECREF(models); PyBuffer_Release(&buf); return NULL; }
                uint8_t *g = (uint8_t *)PyBytes_AS_STRING(grid);
                memset(g, 0, gz * gy * gx);
                const uint8_t *v = data + content + 4;
                for (uint32_t i = 0; i < cnt; i++) {
                    uint32_t vx = v[i * 4], vy = v[i * 4 + 1],
                             vz = v[i * 4 + 2], ci = v[i * 4 + 3];
                    if (vx >= sx || vy >= sy || vz >= sz) continue;
                    /* grid[vx, vz, sy-1-vy] = ci  (vv.cpp remap) */
                    size_t zi = vx, yi = vz, xi = (size_t)(sy - 1 - vy);
                    g[(zi * gy + yi) * gx + xi] = ci;
                }
                PyObject *tup = Py_BuildValue("(IIIN)", sx, sy, sz, grid);
                PyList_Append(models, tup);
                Py_DECREF(tup);
            }
        } else if (memcmp(ch, "RGBA", 4) == 0 && n >= 1024) {
            /* chunk color i -> palette index i+1 (spec) */
            memset(palette, 0, 4);
            memcpy(palette + 4, data + content, 1020);
            have_palette = 1;
        }
        pos = next;
    }
    PyBuffer_Release(&buf);

    PyObject *pal = have_palette
        ? PyBytes_FromStringAndSize((const char *)palette, 1024)
        : (Py_INCREF(Py_None), Py_None);
    return Py_BuildValue("(NN)", models, pal);
}

static PyMethodDef methods[] = {
    {"parse_vox", parse_vox, METH_VARARGS,
     "Parse .vox bytes -> (models list, palette bytes or None)"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_voxnative", "Fast .vox parser", -1, methods,
};

PyMODINIT_FUNC PyInit__voxnative(void) { return PyModule_Create(&moduledef); }
