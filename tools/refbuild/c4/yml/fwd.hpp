#ifndef C4_YML_FWD_SHIM
#define C4_YML_FWD_SHIM
#include "../../ryml.hpp"
#endif
