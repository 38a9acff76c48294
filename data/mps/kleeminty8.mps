NAME          KLEEMINTY8
OBJSENSE
    MAX
ROWS
 N  PROFIT
 L  KM1
 L  KM2
 L  KM3
 L  KM4
 L  KM5
 L  KM6
 L  KM7
 L  KM8
COLUMNS
    X1  PROFIT  128
    X1  KM1  1
    X1  KM2  4
    X1  KM3  8
    X1  KM4  16
    X1  KM5  32
    X1  KM6  64
    X1  KM7  128
    X1  KM8  256
    X2  PROFIT  64
    X2  KM2  1
    X2  KM3  4
    X2  KM4  8
    X2  KM5  16
    X2  KM6  32
    X2  KM7  64
    X2  KM8  128
    X3  PROFIT  32
    X3  KM3  1
    X3  KM4  4
    X3  KM5  8
    X3  KM6  16
    X3  KM7  32
    X3  KM8  64
    X4  PROFIT  16
    X4  KM4  1
    X4  KM5  4
    X4  KM6  8
    X4  KM7  16
    X4  KM8  32
    X5  PROFIT  8
    X5  KM5  1
    X5  KM6  4
    X5  KM7  8
    X5  KM8  16
    X6  PROFIT  4
    X6  KM6  1
    X6  KM7  4
    X6  KM8  8
    X7  PROFIT  2
    X7  KM7  1
    X7  KM8  4
    X8  PROFIT  1
    X8  KM8  1
RHS
    RHS  KM1  5
    RHS  KM2  25
    RHS  KM3  125
    RHS  KM4  625
    RHS  KM5  3125
    RHS  KM6  15625
    RHS  KM7  78125
    RHS  KM8  390625
BOUNDS
ENDATA
