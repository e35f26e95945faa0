#ifndef C4_YML_parse_SHIM
#define C4_YML_parse_SHIM
#include "../../ryml.hpp"
#endif
