#ifndef C4_YML_NODE_SHIM
#define C4_YML_NODE_SHIM
#include "../../ryml.hpp"
#endif
