// mesh_recon.cpp — placeholder translation unit; the native depth→mesh
// fast path lands here (see materialist_tpu/geometry/mesh_recon.py).
extern "C" int materialist_native_abi_version() { return 1; }
