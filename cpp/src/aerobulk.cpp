/* aerobulk_tpu C++ binding implementation.
 *
 * Architecture mirrors the reference's interop chain
 * (aerobulk.cpp -> extern "C" shim -> compute core), with the Fortran
 * core replaced by the JAX core reached through an embedded CPython
 * interpreter.  Input vectors are exposed to Python as read-only
 * memoryviews and outputs as writable memoryviews — no data copies.
 */

#include "aerobulk.hpp"

#include <Python.h>

#include <cassert>
#include <cstdarg>
#include <stdexcept>

namespace aerobulk {

std::string algorithm_to_string(algorithm algo)
{
    switch (algo) {
    case algorithm::OTHER:    return "other";
    case algorithm::COARE3p0: return "coare3p0";
    case algorithm::COARE3p6: return "coare3p6";
    case algorithm::NCAR:     return "ncar";
    case algorithm::ECMWF:    return "ecmwf";
    case algorithm::ANDREAS:  return "andreas";
    }
    return "unknown";
}

int check_sizes(int count, ...)
{
    va_list ap;
    va_start(ap, count);
    int size = va_arg(ap, int);
    for (int i = 1; i < count; i++)
        assert(size == va_arg(ap, int));
    va_end(ap);
    return size;
}

namespace {

PyObject *g_model_fn = nullptr;

void ensure_interpreter()
{
    if (g_model_fn)
        return;
    if (!Py_IsInitialized())
        Py_InitializeEx(0);
    PyObject *mod = PyImport_ImportModule("aerobulk_tpu.capi");
    if (!mod) {
        PyErr_Print();
        throw std::runtime_error(
            "aerobulk: cannot import aerobulk_tpu.capi — is the package "
            "on PYTHONPATH?");
    }
    g_model_fn = PyObject_GetAttrString(mod, "model_buffers");
    Py_DECREF(mod);
    if (!g_model_fn) {
        PyErr_Print();
        throw std::runtime_error("aerobulk: capi.model_buffers missing");
    }
}

PyObject *ro_view(const std::vector<double> &v)
{
    return PyMemoryView_FromMemory(
        reinterpret_cast<char *>(const_cast<double *>(v.data())),
        static_cast<Py_ssize_t>(v.size() * sizeof(double)), PyBUF_READ);
}

PyObject *rw_view(std::vector<double> &v)
{
    return PyMemoryView_FromMemory(
        reinterpret_cast<char *>(v.data()),
        static_cast<Py_ssize_t>(v.size() * sizeof(double)), PyBUF_WRITE);
}

void call_model(int jt, int Nt, const std::string &calgo, double zt,
                double zu, const std::vector<double> &sst,
                const std::vector<double> &t_zt,
                const std::vector<double> &hum_zt,
                const std::vector<double> &U_zu,
                const std::vector<double> &V_zu,
                const std::vector<double> &slp, std::vector<double> &QL,
                std::vector<double> &QH, std::vector<double> &Tau_x,
                std::vector<double> &Tau_y, std::vector<double> &Evap,
                int Niter, bool use_skin, const std::vector<double> *rad_sw,
                const std::vector<double> *rad_lw, std::vector<double> *T_s,
                int series_id)
{
    ensure_interpreter();
    PyGILState_STATE gst = PyGILState_Ensure();

    PyObject *args = Py_BuildValue(
        "(iisddNNNNNNNNNNN)", jt, Nt, calgo.c_str(), zt, zu,
        ro_view(sst), ro_view(t_zt), ro_view(hum_zt), ro_view(U_zu),
        ro_view(V_zu), ro_view(slp), rw_view(QL), rw_view(QH),
        rw_view(Tau_x), rw_view(Tau_y), rw_view(Evap));

    PyObject *kw = PyDict_New();
    PyDict_SetItemString(kw, "niter", PyLong_FromLong(Niter));
    PyDict_SetItemString(kw, "use_skin", PyBool_FromLong(use_skin));
    PyDict_SetItemString(kw, "series_id", PyLong_FromLong(series_id));
    if (rad_sw) PyDict_SetItemString(kw, "rad_sw", ro_view(*rad_sw));
    if (rad_lw) PyDict_SetItemString(kw, "rad_lw", ro_view(*rad_lw));
    if (T_s)    PyDict_SetItemString(kw, "T_s", rw_view(*T_s));

    PyObject *res = PyObject_Call(g_model_fn, args, kw);
    Py_DECREF(args);
    Py_DECREF(kw);
    if (!res) {
        PyErr_Print();
        PyGILState_Release(gst);
        throw std::runtime_error("aerobulk: model_buffers call failed");
    }
    Py_DECREF(res);
    PyGILState_Release(gst);
}

}  // namespace

void model(int jt, int Nt, algorithm algo, double zt, double zu,
           const std::vector<double> &sst, const std::vector<double> &t_zt,
           const std::vector<double> &hum_zt, const std::vector<double> &U_zu,
           const std::vector<double> &V_zu, const std::vector<double> &slp,
           std::vector<double> &QL, std::vector<double> &QH,
           std::vector<double> &Tau_x, std::vector<double> &Tau_y,
           std::vector<double> &Evap, int Niter, bool l_use_skin,
           const std::vector<double> &rad_sw,
           const std::vector<double> &rad_lw, std::vector<double> &T_s,
           int series_id)
{
    int m = check_sizes(8, (int)sst.size(), (int)t_zt.size(),
                        (int)hum_zt.size(), (int)U_zu.size(),
                        (int)V_zu.size(), (int)slp.size(),
                        (int)rad_sw.size(), (int)rad_lw.size());
    QL.resize(m); QH.resize(m); Tau_x.resize(m); Tau_y.resize(m);
    Evap.resize(m); T_s.resize(m);
    call_model(jt, Nt, algorithm_to_string(algo), zt, zu, sst, t_zt, hum_zt,
               U_zu, V_zu, slp, QL, QH, Tau_x, Tau_y, Evap, Niter,
               l_use_skin, &rad_sw, &rad_lw, &T_s, series_id);
}

void model(int jt, int Nt, algorithm algo, double zt, double zu,
           const std::vector<double> &sst, const std::vector<double> &t_zt,
           const std::vector<double> &hum_zt, const std::vector<double> &U_zu,
           const std::vector<double> &V_zu, const std::vector<double> &slp,
           std::vector<double> &QL, std::vector<double> &QH,
           std::vector<double> &Tau_x, std::vector<double> &Tau_y,
           std::vector<double> &Evap, int Niter, int series_id)
{
    int m = check_sizes(6, (int)sst.size(), (int)t_zt.size(),
                        (int)hum_zt.size(), (int)U_zu.size(),
                        (int)V_zu.size(), (int)slp.size());
    QL.resize(m); QH.resize(m); Tau_x.resize(m); Tau_y.resize(m);
    Evap.resize(m);
    call_model(jt, Nt, algorithm_to_string(algo), zt, zu, sst, t_zt, hum_zt,
               U_zu, V_zu, slp, QL, QH, Tau_x, Tau_y, Evap, Niter,
               false, nullptr, nullptr, nullptr, series_id);
}

}  // namespace aerobulk
