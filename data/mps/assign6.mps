NAME          ASSIGN6
ROWS
 N  COST
 E  ROW1
 E  ROW2
 E  ROW3
 E  ROW4
 E  ROW5
 E  ROW6
 E  COL1
 E  COL2
 E  COL3
 E  COL4
 E  COL5
 E  COL6
COLUMNS
    X11  COST  6
    X11  ROW1  1
    X11  COL1  1
    X12  COST  6
    X12  ROW1  1
    X12  COL2  1
    X13  COST  32
    X13  ROW1  1
    X13  COL3  1
    X14  COST  20
    X14  ROW1  1
    X14  COL4  1
    X15  COST  24
    X15  ROW1  1
    X15  COL5  1
    X16  COST  24
    X16  ROW1  1
    X16  COL6  1
    X21  COST  28
    X21  ROW2  1
    X21  COL1  1
    X22  COST  2
    X22  ROW2  1
    X22  COL2  1
    X23  COST  19
    X23  ROW2  1
    X23  COL3  1
    X24  COST  6
    X24  ROW2  1
    X24  COL4  1
    X25  COST  16
    X25  ROW2  1
    X25  COL5  1
    X26  COST  37
    X26  ROW2  1
    X26  COL6  1
    X31  COST  22
    X31  ROW3  1
    X31  COL1  1
    X32  COST  3
    X32  ROW3  1
    X32  COL2  1
    X33  COST  22
    X33  ROW3  1
    X33  COL3  1
    X34  COST  6
    X34  ROW3  1
    X34  COL4  1
    X35  COST  30
    X35  ROW3  1
    X35  COL5  1
    X36  COST  37
    X36  ROW3  1
    X36  COL6  1
    X41  COST  39
    X41  ROW4  1
    X41  COL1  1
    X42  COST  25
    X42  ROW4  1
    X42  COL2  1
    X43  COST  34
    X43  ROW4  1
    X43  COL3  1
    X44  COST  15
    X44  ROW4  1
    X44  COL4  1
    X45  COST  6
    X45  ROW4  1
    X45  COL5  1
    X46  COST  20
    X46  ROW4  1
    X46  COL6  1
    X51  COST  18
    X51  ROW5  1
    X51  COL1  1
    X52  COST  26
    X52  ROW5  1
    X52  COL2  1
    X53  COST  39
    X53  ROW5  1
    X53  COL3  1
    X54  COST  11
    X54  ROW5  1
    X54  COL4  1
    X55  COST  34
    X55  ROW5  1
    X55  COL5  1
    X56  COST  6
    X56  ROW5  1
    X56  COL6  1
    X61  COST  14
    X61  ROW6  1
    X61  COL1  1
    X62  COST  31
    X62  ROW6  1
    X62  COL2  1
    X63  COST  10
    X63  ROW6  1
    X63  COL3  1
    X64  COST  27
    X64  ROW6  1
    X64  COL4  1
    X65  COST  18
    X65  ROW6  1
    X65  COL5  1
    X66  COST  20
    X66  ROW6  1
    X66  COL6  1
RHS
    RHS  ROW1  1
    RHS  ROW2  1
    RHS  ROW3  1
    RHS  ROW4  1
    RHS  ROW5  1
    RHS  ROW6  1
    RHS  COL1  1
    RHS  COL2  1
    RHS  COL3  1
    RHS  COL4  1
    RHS  COL5  1
    RHS  COL6  1
BOUNDS
ENDATA
