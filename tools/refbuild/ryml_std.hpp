#ifndef RYML_STD_SHIM
#define RYML_STD_SHIM
#include "ryml.hpp"
#endif
