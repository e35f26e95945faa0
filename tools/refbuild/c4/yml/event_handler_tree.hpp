#ifndef C4_YML_EHT_SHIM
#define C4_YML_EHT_SHIM
#include "../../ryml.hpp"
#endif
